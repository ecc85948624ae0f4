"""Generic MERGE INTO (upsert-with-clauses) as a single-shuffle batch
operator.

Lakehouse table formats (Delta / Iceberg / Hudi) expose
``MERGE INTO target USING source ON key
   WHEN MATCHED [AND cond] THEN UPDATE ... | DELETE
   WHEN NOT MATCHED [AND cond] THEN INSERT ...``
as the one statement that subsumes upsert, CDC apply, and conditional
delete.  Spark itself has no batch MERGE over plain parquet, but its
semantics are exactly ONE full-outer join plus row-wise clause
dispatch — which is also how Delta's own MERGE physically executes
(join on the condition, then per-row case analysis).  Expressing it
declaratively keeps Catalyst in charge: the join shuffles both sides
once on the key (AQE can still broadcast a small source), every clause
condition is a JVM-side Column, and no driver-side iteration happens
anywhere.

Scale: one key-partitioned shuffle of target + source; clause dispatch
is map-side.  At 100 TB the target side would additionally prune to
key-matching partitions/files (the manifest sink's stats make that a
metadata operation); the clause algebra here is unchanged by that.

Reference parity: the reference's sink can only blind-append
(ref:spark_streaming.py:52-75); this operator is the revise/retract
path its `sensor_aggregates` table lacks, same family as
`cdc_apply_scd1` / `stream_update_upsert` but with the full
matched/not-matched clause surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    *,
    update_set: dict[str, Column] | None = None,
    update_cond: Column | None = None,
    delete_cond: Column | None = None,
    insert_cond: Column | None = None,
) -> DataFrame:
    """Apply MERGE semantics and return the post-merge target table.

    Clause order follows the SQL standard: for a MATCHED (target, source)
    pair, ``delete_cond`` is evaluated first, then ``update_cond`` gates
    ``update_set``; a matched row passing neither clause is kept
    unchanged.  A source row with no target match inserts when
    ``insert_cond`` passes (source must carry every target column).
    Target rows with no source match are always kept.  Merge keys must
    be non-null on both sides (existence after the full-outer join is
    detected via key nullness, the standard MERGE precondition).

    Columns referenced in conditions/update expressions must use the
    ``t.``/``s.`` aliases (``F.col("t.x")``, ``F.col("s.op")``).  All
    conditions default to "never", except that passing ``update_set``
    without ``update_cond`` means "every matched row updates".
    """
    out_cols = target.columns
    t, s = target.alias("t"), source.alias("s")
    on = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key_cols]
    joined = t.join(s, on=F.lit(True) if not on else _and_all(on), how="full_outer")

    t_exists = F.col(f"t.{key_cols[0]}").isNotNull() if key_cols else F.lit(True)
    s_exists = F.col(f"s.{key_cols[0]}").isNotNull() if key_cols else F.lit(True)
    matched = t_exists & s_exists

    del_c = matched & delete_cond if delete_cond is not None else F.lit(False)
    upd_gate = update_cond if update_cond is not None else F.lit(True)
    upd_c = matched & upd_gate if update_set is not None else F.lit(False)
    ins_gate = insert_cond if insert_cond is not None else F.lit(True)
    ins_c = (~t_exists) & s_exists & ins_gate

    keep = matched & ~del_c | (t_exists & ~s_exists)
    projected = []
    for c in out_cols:
        from_update = (update_set or {}).get(c, F.col(f"t.{c}"))
        projected.append(
            F.when(keep & upd_c & ~del_c, from_update)
            .when(keep, F.col(f"t.{c}"))
            .when(ins_c, F.col(f"s.{c}"))
            .alias(c)
        )
    survives = (keep | ins_c).alias("_merge_keep")
    return joined.select(*projected, survives).filter(F.col("_merge_keep")).drop("_merge_keep")


def _and_all(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
