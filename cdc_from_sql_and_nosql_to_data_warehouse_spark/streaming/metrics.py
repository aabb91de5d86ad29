"""Streaming observability (O4): a StreamingQueryListener capturing
per-batch progress the way the reference prints batch sizes and file
moves (``write_dynamodb_stream_to_s3_lambda/handler.py:25,59``,
``load_s3_files...handler.py:58-61,116-120``) — but structured, queryable,
and per-query instead of buried in CloudWatch logs."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_name: str | None
    batch_id: int
    num_input_rows: int
    sink_description: str
    watermark: str | None


@dataclass
class PipelineMetrics(StreamingQueryListener):
    """Collects one BatchMetric per completed micro-batch.

    Attach with ``spark.streams.addListener(metrics)``; totals answer
    the reference's observability questions (how many records per
    trigger, did the batch make progress) without driver-side counts in
    the data path.
    """

    batches: list[BatchMetric] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.batches.append(
            BatchMetric(
                query_name=p.name,
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                sink_description=p.sink.description,
                watermark=(p.eventTime or {}).get("watermark"),
            )
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def total_input_rows(self, query_name: str | None = None) -> int:
        return sum(
            b.num_input_rows
            for b in self.batches
            if query_name is None or b.query_name == query_name
        )
