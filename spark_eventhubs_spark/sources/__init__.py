from spark_eventhubs_spark.sources.hub import SimulatedEventHubs
from spark_eventhubs_spark.sources.client import SimulatedClient
from spark_eventhubs_spark.sources.batch import read_eventhubs
from spark_eventhubs_spark.sources.writer import write_eventhubs

__all__ = ["SimulatedEventHubs", "SimulatedClient", "read_eventhubs", "write_eventhubs"]
