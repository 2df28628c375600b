"""Import every plan module so the QUERIES registry is fully populated."""

import advanced_strapi_import_spark.plans.parity  # noqa: F401
import advanced_strapi_import_spark.plans.parity_etl  # noqa: F401
import advanced_strapi_import_spark.plans.parity_sink  # noqa: F401
import advanced_strapi_import_spark.plans.parity_media  # noqa: F401
import advanced_strapi_import_spark.plans.parity_ml  # noqa: F401
import advanced_strapi_import_spark.plans.parity_window  # noqa: F401
import advanced_strapi_import_spark.plans.parity_stream  # noqa: F401
import advanced_strapi_import_spark.plans.parity_analytics  # noqa: F401
import advanced_strapi_import_spark.plans.parity_temporal  # noqa: F401
import advanced_strapi_import_spark.plans.parity_pipeline  # noqa: F401
import advanced_strapi_import_spark.plans.parity_skew  # noqa: F401
import advanced_strapi_import_spark.plans.parity_tpch  # noqa: F401
