from spark_eventhubs_spark.plans.hubview import (
    EVENT_HUBS_SCHEMA,
    hub_view,
    hub_view_flat,
    oracle_hub_cte,
)

__all__ = ["EVENT_HUBS_SCHEMA", "hub_view", "hub_view_flat", "oracle_hub_cte"]
