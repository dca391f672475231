from eclipse_spark.plans.dag import PlanNode, fingerprint_fn

__all__ = ["PlanNode", "fingerprint_fn"]
