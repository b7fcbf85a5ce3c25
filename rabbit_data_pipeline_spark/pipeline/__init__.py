from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler
from rabbit_data_pipeline_spark.pipeline.spec import NodeSpec, PipelineSpec

__all__ = ["Scheduler", "PipelineSpec", "NodeSpec"]
