"""Import every plan module so the registry is fully populated."""

import couchwarehouse_spark.plans.curation  # noqa: F401
import couchwarehouse_spark.plans.dedup  # noqa: F401
import couchwarehouse_spark.plans.etl  # noqa: F401
import couchwarehouse_spark.plans.events_windows  # noqa: F401
import couchwarehouse_spark.plans.multimodal_plan  # noqa: F401
import couchwarehouse_spark.plans.relational  # noqa: F401
import couchwarehouse_spark.plans.relational_extra  # noqa: F401
import couchwarehouse_spark.plans.sampling  # noqa: F401
import couchwarehouse_spark.plans.scalar  # noqa: F401
import couchwarehouse_spark.plans.similarity  # noqa: F401
import couchwarehouse_spark.plans.skew_plan  # noqa: F401
import couchwarehouse_spark.plans.statistics  # noqa: F401
import couchwarehouse_spark.plans.streaming_e2e  # noqa: F401
import couchwarehouse_spark.plans.text  # noqa: F401
import couchwarehouse_spark.plans.warehouse_e2e  # noqa: F401
