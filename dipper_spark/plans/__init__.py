from dipper_spark.plans.catalog import ORACLES, QUERIES, flagship
import dipper_spark.plans.catalog_text  # noqa: F401  (registers into QUERIES/ORACLES)

__all__ = ["ORACLES", "QUERIES", "flagship"]
