from vectorflow_spark.streaming.pipeline import (
    run_streaming_pipeline,
    sessionize_events,
    windowed_event_counts,
)

__all__ = ["run_streaming_pipeline", "windowed_event_counts", "sessionize_events"]
