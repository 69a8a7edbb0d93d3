from dipper_spark.plans.catalog import ORACLES, QUERIES, flagship
import dipper_spark.plans.catalog_text  # noqa: F401  (registers into QUERIES/ORACLES)
import dipper_spark.plans.catalog_multimodal  # noqa: F401
import dipper_spark.plans.catalog_search  # noqa: F401

__all__ = ["ORACLES", "QUERIES", "flagship"]
