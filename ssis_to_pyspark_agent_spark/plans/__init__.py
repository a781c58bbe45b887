"""Pipeline spec + runner."""

from ssis_to_pyspark_agent_spark.plans.runner import RunResult, Runner, run_pipeline
from ssis_to_pyspark_agent_spark.plans.spec import Pipeline, Step

__all__ = ["Pipeline", "Step", "Runner", "RunResult", "run_pipeline"]
