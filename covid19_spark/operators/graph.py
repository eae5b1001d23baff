"""Iterative graph algorithms as DataFrame loops — PageRank.

The canonical iterative-workload shape on Spark: the edge frame is
materialized ONCE (eager localCheckpoint — read k times, freed with the
result's lineage) and each iteration is one join + one keyed aggregation,
i.e. exactly one shuffle of the edge list per iteration. Rank state is a
|V|-row frame, never driver-side. This is the textbook Pregel-on-dataflow
reduction (Page et al. 1999; Malewicz et al. 2010 §2 message-passing view):
``contrib(u→v) = rank(u) · nw(u,v)`` over once-normalized edge weights
``nw = w/W(u)``, ``rank'(v) = (1-d)/N + d · Σ contrib``.

Determinism across engines (the DuckDB oracle replays the same fixed
number of iterations): each contribution term is the same left-to-right
double expression ``(rank * w) / W`` in both engines, and the Σ quantizes
every term to a fixed 1e-15 grid via ``floor(term · 10^15) :: BIGINT``
before an exact integer sum — ``floor`` on identical doubles is identical,
integer addition is order-independent, and the final ``Σ/10^15`` division
is one deterministic double op. (A DECIMAL(38,18) per-term cast — the
catalog's usual trick — is NOT portable here: Spark rounds HALF_UP on the
double→decimal cast while DuckDB differs in the last decimal unit, and
three iterations compound the ulp into a visible hash mismatch; the floor
grid sidesteps rounding-mode divergence entirely.)

At 100 TB-scale graphs the per-iteration shuffle IS the algorithm's cost
floor; nothing here is ever pairwise beyond the edge list itself, and the
rank state co-partitions with the edge source key after the first
iteration (AQE reuses the exchange)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1e15


def _gridsum(col):
    """Order-independent deterministic sum of small doubles (|terms| ≤ 1):
    exact integer sum over the 1e-15 floor grid (see module docstring)."""
    return F.sum(F.floor(col * F.lit(_SCALE)).cast("long")) / F.lit(_SCALE)


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """``(node, rank)`` after ``iterations`` weighted-PageRank rounds.

    ``edges`` must cover every node with at least one OUT-edge (dangling
    nodes are the caller's modeling decision — the registry query builds a
    symmetrized graph where none exist). The edge frame is evaluated
    eagerly once; each round is one broadcast-free join + one aggregate."""
    edges = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    ).localCheckpoint(eager=True)

    # w is integral (a count): double partial sums are EXACT below 2^53,
    # so a plain sum is already order-independent and engine-identical.
    # Normalize out-weights ONCE (nw = w / W(u)) instead of re-joining the
    # out-weight frame inside every iteration — the per-round plan shrinks
    # to one join + one aggregate. edges_n and nodes are eager
    # localCheckpoints because every round (and the final left join)
    # re-reads them; both free with the result's lineage.
    out_w = edges.groupBy("src").agg(F.sum("w").alias("wu"))
    edges_n = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("wu")).alias("nw"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # scalar by contract (|V| is a count, not a frame)
    base = (1.0 - damping) / n

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contribs = (
            edges_n.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("nw")).alias("__c"),
            )
            .groupBy("node")
            .agg(_gridsum(F.col("__c")).alias("__in"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))).alias(
                "rank"
            ),
        )
    return ranks
