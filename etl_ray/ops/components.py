"""Connected components over a near-duplicate pair list — the dedup
FINISHER: candidate pairs (from MinHash-LSH / SimHash / embedding buckets)
are edges; each component is one duplicate cluster; the canonical survivor
is the smallest doc_id, everything else is dropped.

The reference engine's dedup is row-level LWW (same key wins); this is the
training-data analog where *different* keys are semantic duplicates, so the
collapse needs a transitive closure, not a groupby. Cf. the dedup pipeline
refs in ops/dedup.py (parser/tcpinfo.go:171-209 thinning is the closest
reference op — keep-one-of-many — but within one key).

Algorithm (hash-to-min label propagation, known O(log d) rounds):
  labels L(x) = x initially, for every endpoint of any edge.
  per round, each node's new label is the min of
    - its current label (self row),
    - its neighbors' labels (two shuffle joins edge->labels),
    - its label's label (pointer jumping — one labels-with-labels join;
      this is what collapses long chains in log rounds instead of
      diameter rounds).
  A round is: 3 hash joins + 1 groupby Min — all Ray Data native ops, no
  driver-side graph. Convergence is detected with zero extra joins: the
  self row carries the old label through the groupby (Max over a column
  that is null on non-self rows), and a tiny count-changed aggregate gates
  the loop. Label tables are O(nodes-in-pairs) — the pair set is orders of
  magnitude smaller than the corpus after LSH banding, so every round's
  shuffle is small; the 100 TB cost center stays in candidate generation,
  not here.

Determinism: the node/label dtype is preserved from the input edge
columns (int ids stay int), so "min" means the same ordering on the
engine and the DuckDB recursive-CTE oracle.

Robustness note: Ray's map operators SKIP empty input blocks and emit
ZERO-COLUMN empty blocks in their place (measured: the UDF is never
called), and the hash-shuffle join aggregator fails on those ("no match
for key field"). Projection ops (select/rename) do not repair them
either. So every dataset fed into a join is first compacted to its
non-empty blocks via ``_nonempty`` — a metadata-only pass over the
materialized ref bundles (no block is fetched to the driver), zero-copy
via ``from_arrow_refs``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min

def _nonempty(ds):
    """Materialize ``ds`` and drop empty blocks (join inputs must not
    contain Ray's schemaless empty blocks). Metadata-only on the driver;
    block refs are reused zero-copy."""
    import ray
    import ray.data as rd

    m = ds.materialize()
    refs = [ref for b in m.iter_internal_ref_bundles()
            for ref, meta in b.blocks if meta.num_rows]
    return rd.from_arrow_refs(refs) if refs else m




def _nodes_from_edges(edges, id_a: str, id_b: str):
    def explode(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([
            t[id_a].combine_chunks(),
            t[id_b].combine_chunks(),
        ])
        return pa.table({"node": ids.unique()})

    return (
        edges.map_batches(explode, batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="_n"))
        .select_columns(["node"])
    )


def connected_components(edges, *, id_a: str = "id_a", id_b: str = "id_b",
                         max_rounds: int = 20, num_partitions: int = None):
    """Component id (= min doc_id in the component) for every node that
    appears in ``edges``. Returns a Dataset of (node, component).

    ``max_rounds`` is a safety cap; with pointer jumping, real dup graphs
    converge in 2-4 rounds and a path graph of length 2^k in ~k."""
    from etl_ray.ops.joins import hash_join_kw

    jkw = hash_join_kw(num_partitions)
    sch = edges.schema()
    typ = dict(zip(sch.names, sch.types))[id_a]

    def pick(*cols):
        def f(t: pa.Table) -> pa.Table:
            if len(t) == 0:  # may be a schemaless block from a join
                return pa.table({new: pa.array([], typ)
                                 for new, _ in cols})
            return pa.table({new: t[old].combine_chunks().cast(typ)
                             for new, old in cols})

        return f

    # edge list normalized (renamed, id dtype preserved) once; reused
    # every round
    e = _nonempty(edges.map_batches(pick(("id_a", id_a), ("id_b", id_b)),
                                    batch_format="pyarrow"))
    labels = _nonempty(_nodes_from_edges(e, "id_a", "id_b").map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["node"]}),
        batch_format="pyarrow",
    ))

    def as_cand(node_col, cand_col, with_old=False):
        def f(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                e = pa.array([], typ)
                return pa.table({"node": e, "cand": e, "old": e})
            node = t[node_col].combine_chunks()
            cand = t[cand_col].combine_chunks()
            out = {"node": node, "cand": cand,
                   "old": cand if with_old else pa.nulls(len(t), typ)}
            return pa.table(out)

        return f

    for _ in range(max_rounds):
        # neighbor labels: (a,b) x labels -> label_a, label_b
        e1 = e.join(labels, on=("id_a",), right_on=("node",), **jkw)
        e2 = _nonempty(
            e1.map_batches(pick(("id_a", "id_a"), ("id_b", "id_b"),
                                ("label_a", "label")),
                           batch_format="pyarrow")
        ).join(labels, on=("id_b",), right_on=("node",), **jkw)

        def both_dirs(t: pa.Table) -> pa.Table:
            n = len(t)
            if n == 0:
                e = pa.array([], typ)
                return pa.table({"node": e, "cand": e, "old": e})
            return pa.table({
                "node": pa.concat_arrays([t["id_a"].combine_chunks(),
                                          t["id_b"].combine_chunks()]),
                "cand": pa.concat_arrays([t["label"].combine_chunks(),
                                          t["label_a"].combine_chunks()]),
                "old": pa.nulls(2 * n, typ),
            })

        neighbor = e2.map_batches(both_dirs, batch_format="pyarrow")
        # pointer jumping: node -> label -> that label's label
        pj = labels.join(
            labels, on=("label",), right_on=("node",), right_suffix="_p",
            **jkw,
        ).map_batches(as_cand("node", "label_p"), batch_format="pyarrow")
        selfr = labels.map_batches(as_cand("node", "label", with_old=True),
                                   batch_format="pyarrow")
        merged = (
            neighbor.union(pj, selfr)
            .groupby("node")
            .aggregate(Min("cand", alias_name="label"),
                       Max("old", alias_name="old"))
        ).materialize()
        changed = merged.map_batches(
            lambda t: pa.table({"c": [pc.sum(pc.cast(pc.not_equal(
                t["label"], t["old"]), pa.int64())).as_py() or 0]}),
            batch_format="pyarrow",
        ).sum("c")
        labels = _nonempty(merged.select_columns(["node", "label"]))
        if not changed:
            break
    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "component": t["label"]}),
        batch_format="pyarrow",
    )


def dup_clusters(pairs, *, id_col: str = "doc_id",
                 id_a: str = "id_a", id_b: str = "id_b",
                 num_partitions: int = None):
    """Keep/drop decision per clustered document: (doc_id, component,
    keep). ``keep`` is true only for the canonical (min) member. Docs
    outside any pair are implicit keeps and are NOT enumerated here —
    at corpus scale the cluster table is the small output."""
    cc = connected_components(pairs, id_a=id_a, id_b=id_b,
                              num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["node"], t["component"])
        return pa.table({id_col: t["node"], "component": t["component"],
                         "keep": keep})

    return cc.map_batches(finish, batch_format="pyarrow")


def dup_clusters_by_quality(pairs, quality, *, id_col: str = "doc_id",
                            quality_col: str = "n_words",
                            id_a: str = "id_a", id_b: str = "id_b",
                            num_partitions: int = None):
    """Keep/drop per clustered doc where the canonical member is the
    HIGHEST-quality one (ties → min id), not the min id — the curation
    refinement that keeps the longest/cleanest copy of a near-dup family
    instead of whichever id sorts first.

    ``quality`` is a Dataset of (id_col, quality_col). Scale shape: ONE
    hash join attaches quality to the (small — clustered docs only)
    component table, then the per-component winner is a single bucketed
    map_groups pass (vectorized transform, no per-group Python beyond
    the groupby dispatch). Deliberately NOT a chain of Dataset.joins:
    each join parks an aggregator actor pool, and chained pools can
    reserve past cluster capacity and wedge (see joins.hash_join_kw)."""
    import pandas as pd

    from etl_ray.ops.joins import hash_join_kw

    cc = connected_components(pairs, id_a=id_a, id_b=id_b,
                              num_partitions=num_partitions)
    renamed = cc.map_batches(
        lambda t: t.rename_columns(
            [id_col if c == "node" else c for c in t.column_names]),
        batch_format="pyarrow")
    labeled = renamed.join(quality, on=(id_col,), **hash_join_kw())

    def per_component(g: pd.DataFrame) -> pd.DataFrame:
        # winner = max quality, then min id — one vectorized transform
        q = g[quality_col].to_numpy()
        best = q == q.max()
        winner = g.loc[best, id_col].min()
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "component": g["component"].to_numpy(),
            "keep": (g[id_col] == winner).to_numpy(),
        })

    return labeled.groupby("component").map_groups(
        per_component, batch_format="pandas")
