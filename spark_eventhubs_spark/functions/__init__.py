from spark_eventhubs_spark.functions.hashing import md5_hash64, ORACLE_MD5_HASH64

__all__ = ["md5_hash64", "ORACLE_MD5_HASH64"]
