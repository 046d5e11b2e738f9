"""Conf-string encryption twins (crypto.py <-> EventHubsUtils.scala:178-207)."""

import pytest

from spark_eventhubs_spark import crypto
from spark_eventhubs_spark.conf import CONNECTION_STRING_KEY, EventHubsConf
from spark_eventhubs_spark.connstr import file_hub_connection_string

from conftest import SF_DIR

CONN = file_hub_connection_string(SF_DIR, "events")


def test_encode_decode_roundtrip():
    assert crypto.decode(crypto.encode("abc=;/123")) == "abc=;/123"


def test_encrypt_decrypt_roundtrip_and_shape():
    ct = crypto.encrypt(CONN)
    assert ct != CONN
    # base64 of whole AES blocks, deterministic (ECB, fixed PBKDF2 key —
    # same as the reference's version-derived SecretKeySpec)
    assert crypto.encrypt(CONN) == ct
    assert crypto.decrypt(ct) == CONN


def test_decrypt_rejects_garbage():
    with pytest.raises(ValueError):
        crypto.decrypt("definitely;not=ciphertext")
    # plaintext-tolerant read returns the input unchanged
    assert crypto.decrypt_or_plaintext("definitely;not=ciphertext") == (
        "definitely;not=ciphertext"
    )


def test_conf_stores_ciphertext_reads_plaintext():
    conf = EventHubsConf(CONN)
    raw = conf.get(CONNECTION_STRING_KEY)
    assert raw != CONN  # the secret never sits in the map in the clear
    assert conf.connection_string == CONN
    assert conf.name == "events"


def test_conf_map_roundtrip_carries_ciphertext():
    conf = EventHubsConf(CONN).set_consumer_group("g1")
    m = conf.to_map()
    assert m[CONNECTION_STRING_KEY] != CONN
    back = EventHubsConf.from_map(m)  # the reference's toConf moment
    assert back.connection_string == CONN
    assert back.consumer_group == "g1"


def test_plaintext_option_maps_still_accepted():
    # hand-written option dicts (no set_connection_string involved)
    conf = EventHubsConf.from_map({CONNECTION_STRING_KEY: CONN})
    assert conf.connection_string == CONN
