"""S7 external HTTP sink — POST assembled chart-request documents to a
visualization service.

Reference: ``VisualizationService.java:38-43`` posts the Gson-serialized
chart request (built by ``Visualizer.java:363,414,471,522``) to an external
chart-rendering HTTP endpoint and returns the rendered bytes. The document
assembly lives in ``serving/charts.py`` (``to_json(struct(...))`` in-plan);
this module is the transport.

Scale design: the POSTs run on the EXECUTORS via ``mapInPandas`` — one task
per partition, each row posted with bounded retries — so a million chart
documents fan out across the cluster instead of serializing through the
driver. The sink returns a status DataFrame (id, http status, response size)
so delivery is observable/retryable as data, mirroring how the reference
surfaces failed renders in its logs. Per-row HTTP is I/O-bound, not
CPU-bound, so row-at-a-time Python here is not the UDF anti-pattern — the
wire call dominates.

Only Python stdlib (``urllib``) is used; no external HTTP client.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request
from collections.abc import Iterator

from pyspark.sql import DataFrame

RESULT_SCHEMA = "id string, status int, response_bytes int, error string"


def post_document(
    body: bytes,
    url: str,
    timeout: float = 10.0,
    retries: int = 3,
    backoff: float = 0.2,
    content_type: str = "application/json",
) -> bytes:
    """POST one document; exponential backoff on 5xx / connection errors.

    4xx responses do NOT retry (the document is wrong, not the service).
    """
    last_err: Exception | None = None
    for attempt in range(retries):
        try:
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": content_type}, method="POST"
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code < 500:
                raise
            last_err = e
        except (urllib.error.URLError, TimeoutError, ConnectionError) as e:
            last_err = e
        time.sleep(backoff * (2**attempt))
    raise last_err  # type: ignore[misc]


def post_chart_documents(
    df: DataFrame,
    url: str,
    doc_col: str = "chart_request",
    id_col: str = "chart_id",
    timeout: float = 10.0,
    retries: int = 3,
) -> DataFrame:
    """Executor-side POST of every row's ``doc_col`` JSON document to ``url``.

    Returns a status frame (one row per input document) rather than raising:
    at fleet scale a flaky render service must not kill the job, and the
    failed subset stays queryable for a retry pass.
    """

    def _post(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for cid, doc in zip(pdf[id_col], pdf[doc_col]):
                try:
                    resp = post_document(
                        doc.encode("utf-8"), url, timeout=timeout, retries=retries
                    )
                    out.append((str(cid), 200, len(resp), None))
                except urllib.error.HTTPError as e:
                    out.append((str(cid), int(e.code), 0, str(e)))
                except Exception as e:  # noqa: BLE001 — error-as-data contract
                    out.append((str(cid), -1, 0, str(e)))
            yield pd.DataFrame(out, columns=["id", "status", "response_bytes", "error"])

    return df.select(id_col, doc_col).mapInPandas(_post, schema=RESULT_SCHEMA)


def stream_chart_requests(
    stream_df: DataFrame,
    url: str,
    checkpoint_dir: str,
    doc_col: str = "chart_request",
    id_col: str = "chart_id",
    query_name: str = "chart_http_sink",
):
    """Streaming form: each micro-batch's documents are posted from the
    executors via ``foreachBatch`` (S4+S7 composed, as the reference's
    scheduled visualizer does on each refresh tick)."""

    def _post_batch(batch_df: DataFrame, _epoch: int) -> None:
        # noop-write forces the full posting pass; statuses land in the logs
        # of each task. A production sink would append them to a status table.
        post_chart_documents(batch_df, url, doc_col, id_col).write.format(
            "noop"
        ).mode("overwrite").save()

    return (
        stream_df.writeStream.outputMode("update")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_post_batch)
        .start()
    )
