"""Connected components at scale: alternating large-star / small-star
contraction (Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014).

The engine already runs min-label PROPAGATION for near-dup clusters
(dedup.neardup_clusters) — correct there because verified-duplicate
components are tiny and shallow. Propagation, however, needs
O(diameter) rounds: a 100 TB co-occurrence graph with a
million-node chain component would take a million synchronized
shuffles. Star contraction converges in O(log² n) rounds on ANY
topology (each round at least halves the number of non-root nodes in
expectation), which is why it — not propagation — is the canonical
MapReduce/Spark CC. This module provides it as a generic operator
plus the registered co-purchase component query.

Round shape (all DataFrame ops, driver holds only the loop counter):
  large-star: every node connects its strictly-larger neighbors to
    the smallest node in its closed neighborhood;
  small-star: every node connects its smaller neighbors (and itself)
    to that minimum.
Each is one groupBy (min per node) + one equi-join back to the edge
list — two shuffles per round over the CURRENT edge set, which only
shrinks toward the star forest. Convergence is an exact one-job
fixpoint test (star forest ⇔ no dst also appears as src AND every
src has out-degree 1; both operations preserve connectivity, so a
star forest's components are the input's), and each round's output
is localCheckpoint-ed so
lineage stays flat (the same iterative-algorithm pattern as
kmeans/pagerank/neardup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


CC_MAX_ROUNDS = 50  # safety rail only: log²(n) rounds; 50 covers any real n


def star_components(edges: DataFrame, max_rounds: int = CC_MAX_ROUNDS,
                    stats: dict | None = None) -> DataFrame:
    """(src, dst) undirected edge list (any orientation, self-loops
    ignored) → (node, comp) where comp is the component's minimum node
    id — identical labels to min-label propagation, in O(log² n)
    rounds instead of O(diameter). Isolated nodes don't appear in an
    edge list, so they are absent here too (callers union them back if
    their table knows them). Pass ``stats`` to receive {"rounds": r}
    for rehearsals/tests."""
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("u"),
            F.least("src", "dst").alias("v"),
        )
        .distinct()
        # LAZY: the first fixpoint probe below materializes it — one
        # job per round instead of two (r10; same per-round work, the
        # probe job simply computes the round's edge set on the way)
        .localCheckpoint(eager=False)
    )
    rounds = 0
    for _ in range(max_rounds + 1):
        # ONE node-grain aggregate over the endpoint stream serves BOTH
        # the exact fixpoint probe and large-star's neighborhood
        # minimum (r10 fusion — they aggregate the same stream by the
        # same key, so computing them apart paid a second union pass +
        # exchange per round). Probe: with edges oriented big→small,
        # the edge set is a star forest iff BOTH hold: (a) no dst also
        # appears as a src (depth 1 everywhere) AND (b) every src has
        # out-degree 1 (a node attached to TWO distinct roots — the
        # V-shape (1,3),(2,3) → edges 3→1, 3→2 — passes (a) alone but
        # is one component, not two stars; checking only (a) returned
        # wrong labels on exactly that shape). Both star operations
        # preserve connectivity, so a star forest's components ARE the
        # input's components — and a star forest is a fixpoint of both
        # operations, so stopping here is exact. e is distinct, so
        # ns = the src out-degree, and nt > ns marks a dst occurrence.
        both = e.select(
            F.col("u").alias("x"), F.col("v").alias("y"), F.lit(1).alias("s")
        ).unionAll(
            e.select(F.col("v").alias("x"), F.col("u").alias("y"), F.lit(0).alias("s"))
        )
        agg = (
            both.groupBy("x")
            .agg(
                F.min("y").alias("mn"),
                F.sum("s").alias("ns"),
                F.count(F.lit(1)).alias("nt"),
            )
            # lazy: the probe count below materializes it (and, through
            # its lineage, this round's e) — still one job per round
            .localCheckpoint(eager=False)
        )
        not_star = (
            agg.filter(
                (F.col("ns") > 1)
                | ((F.col("ns") > 0) & (F.col("nt") > F.col("ns")))
            )
            .limit(1)
            .count()
        )
        if not_star == 0:
            break
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"star_components did not converge in {max_rounds} rounds"
            )
        # large-star: from each node x's view (both directions), attach
        # every strictly larger neighbor y to m(x) = min(N(x) ∪ {x}).
        # Each undirected edge is seen once from its smaller endpoint
        # (y > x), and m(x) ≤ x < y keeps the big→small orientation.
        # m comes straight off the materialized probe aggregate.
        m = agg.select("x", F.least("mn", F.col("x")).alias("m"))
        # no distinct here: duplicate (u, v) rows only pad the next
        # two map-side-combined aggregates and are collapsed by the
        # round-end distinct — dropping the dedup saves one full
        # shuffle per round
        ls = (
            both.join(m, "x")
            .filter(F.col("y") > F.col("x"))
            .select(F.col("y").alias("u"), F.col("m").alias("v"))
        )
        # small-star: edges are big→small, so N⁻(u) is just u's dst
        # set; attach each of them (and u) to m(u) = min(N⁻(u)).
        mn = ls.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            ls.join(mn, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(mn.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
            # lazy: the next round's fixpoint probe materializes it
            .localCheckpoint(eager=False)
        )
    if stats is not None:
        stats["rounds"] = rounds
    # converged star forest: every non-root points straight at its
    # root (min(v) is belt-and-braces, not load-bearing); roots are
    # dsts that never appear as src
    non_root = (
        e.groupBy("u").agg(F.min("v").alias("comp"))
        .select(F.col("u").alias("node"), "comp")
    )
    roots = (
        e.select(F.col("v").alias("node"))
        .distinct()
        .join(non_root.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("comp"))
    )
    return non_root.unionByName(roots)


def part_components(spark, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase affinity graph (part
    pairs sharing ≥ BASKET_MIN_SUPPORT common orders — the same
    session-cached pair base as basket_affinity/part_pagerank, so a
    green hash here binds that base a third way): per component, its
    id (min part key), member count, and edge count. The product-
    catalog analogue of dedup clustering — "which products form one
    co-purchase family" — and the registered face of star_components.
    """
    from .corpus_analytics import BASKET_MIN_SUPPORT, _li_pair_counts

    pairs = (
        _li_pair_counts(spark, sf_dir)
        .filter(F.col("w") >= BASKET_MIN_SUPPORT)
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    return components_summary(pairs)


def components_summary(pairs: DataFrame) -> DataFrame:
    """Per-component (id, member count, edge count) from a (src, dst)
    edge list — shared with the streaming co-purchase store's resolved
    view (streaming_triangles.py)."""
    # lazy (r10): two consumers (CC + edge count); star_components'
    # first fixpoint-probe count materializes it through its lineage
    pairs = pairs.localCheckpoint(eager=False)
    # labels feeds both the size aggregate and the edge-count join —
    # lazy checkpoint so the converged star forest's label assembly
    # (union + anti-join) computes once per action, not per consumer
    labels = star_components(pairs).localCheckpoint(eager=False)
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("n_parts"))
    edge_counts = (
        pairs.join(labels, pairs.src == labels.node)
        .groupBy("comp")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        sizes.join(edge_counts, "comp")
        .select(
            F.col("comp").alias("component_id"),
            F.col("n_parts").cast("bigint").alias("n_parts"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
        )
    )


# Oracle: the same quadratic recursive-reachability formulation the
# near-dup cluster oracle uses (reach enumerates every (node, smaller
# reachable id); min is the component label). Quadratic is oracle-only
# — the engine side is the O(log² n) contraction.
PART_COMPONENTS_SQL = """
WITH RECURSIVE li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), p AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS w
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), strong AS (
  SELECT pa, pb FROM p WHERE w >= {minsup}
), edges AS (
  SELECT pa AS src, pb AS dst FROM strong
  UNION ALL
  SELECT pb AS src, pa AS dst FROM strong
), reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, w.r FROM edges e JOIN reach w ON w.node = e.dst
), labels AS (
  SELECT node, min(r) AS comp FROM reach GROUP BY node
), sizes AS (
  SELECT comp, CAST(count(*) AS BIGINT) AS n_parts FROM labels GROUP BY comp
), ec AS (
  SELECT l.comp, CAST(count(*) AS BIGINT) AS n_edges
  FROM strong s JOIN labels l ON s.pa = l.node
  GROUP BY l.comp
)
SELECT sizes.comp AS component_id, n_parts, n_edges
FROM sizes JOIN ec ON sizes.comp = ec.comp
"""


KCORE_K = 3        # the core order under test
KCORE_ROUNDS = 16  # oracle unroll depth: the DuckDB twin runs EXACTLY
                   # this many peel rounds; the engine peels to the
                   # runtime fixpoint, and a test asserts every gate
                   # corpus converges within this depth (sf0.001: 0
                   # rounds, sf0.01: 10, sf0.1: 2 — measured), so the
                   # oracle's trailing rounds are no-ops and the hash
                   # binds the TRUE core. The previous depth of 8 was
                   # short of sf0.01's 10: both engines stopped
                   # mid-peel and agreed on 5 non-core nodes — the
                   # exact silent-wrong-at-scale mode the runtime
                   # guard now prevents
KCORE_MAX_ROUNDS = 64  # engine budget — peel chains can need O(n)
                       # rounds on adversarial topologies; past this
                       # the operator raises instead of silently
                       # returning non-core nodes (the star_components
                       # contract)


def kcore(edges: DataFrame, k: int = KCORE_K,
          max_rounds: int = KCORE_MAX_ROUNDS,
          stats: dict | None = None) -> DataFrame:
    """K-core peeling to the TRUE fixpoint: drop every node with fewer
    than ``k`` surviving neighbors, recompute degrees, repeat until the
    edge set stops shrinking (Seidman 1983). Input is an undirected
    (u, v) edge list (one row per edge, no self-loops); output is
    (node, core_degree) for the surviving core.

    Per round: one degree aggregate + two semi-joins against the
    survivor set, then a count of the checkpointed result — peeling is
    monotone (edges only shrink), so an unchanged edge COUNT is an
    exact set-fixpoint test, one cheap job per round on data that was
    just materialized anyway. Rounds past ``max_rounds`` raise — a
    deeper graph fails loudly rather than silently labeling nodes with
    < k surviving neighbors as core members. The driver holds only the
    loop counter; survivor sets stay distributed and checkpointed
    (flat lineage). Pass ``stats`` to receive {"rounds": r}."""
    # lazy (r10): the count materializes it — one job, not two
    e = edges.localCheckpoint(eager=False)
    n_edges = e.count()
    rounds = 0
    while n_edges > 0:
        both = e.select(F.col("u").alias("n")).unionAll(
            e.select(F.col("v").alias("n"))
        )
        alive = (
            both.groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("n")
        )
        nxt = (
            e.join(alive.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(alive.withColumnRenamed("n", "v"), "v", "left_semi")
            # lazy: the fixpoint count below materializes it — one job
            # per peel round instead of two (r10)
            .localCheckpoint(eager=False)
        )
        n_nxt = nxt.count()
        if n_nxt == n_edges:
            break  # exact fixpoint: monotone shrink + equal count
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"kcore did not converge in {max_rounds} rounds"
            )
        e, n_edges = nxt, n_nxt
    if stats is not None:
        stats["rounds"] = rounds
    both = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    return both.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )


def part_kcore(spark, sf_dir: str) -> DataFrame:
    """K-core of the co-purchase graph — the classic cohesive-subgraph
    extractor: what remains is the graph's stable trading core, where
    every member keeps ≥ K co-purchase partners even after the fringe
    is removed — the fourth consumer of the shared pair base, and the
    densest-region complement to the component/triangle views. Peels
    to the runtime fixpoint via :func:`kcore`; the oracle unrolls
    KCORE_ROUNDS rounds, which a test pins as past convergence on the
    gate corpus. Output: (part, core_degree)."""
    from .corpus_analytics import BASKET_MIN_SUPPORT, _li_pair_counts

    edges = (
        _li_pair_counts(spark, sf_dir)
        .filter(F.col("w") >= BASKET_MIN_SUPPORT)
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
    )
    return kcore(edges).withColumnRenamed("node", "part")


def _kcore_round_duck(i: int, prev: str) -> str:
    return f"""alive{i} AS MATERIALIZED (
  SELECT n FROM (
    SELECT n, count(*) AS deg FROM (
      SELECT u AS n FROM {prev} UNION ALL SELECT v AS n FROM {prev}
    ) GROUP BY n
  ) WHERE deg >= {KCORE_K}
), e{i} AS MATERIALIZED (
  SELECT u, v FROM {prev}
  WHERE u IN (SELECT n FROM alive{i}) AND v IN (SELECT n FROM alive{i})
)"""


def _kcore_sql() -> str:
    ctes = ",\n".join(
        _kcore_round_duck(i, f"e{i - 1}" if i else "e0_base")
        for i in range(KCORE_ROUNDS)
    )
    return f"""
WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), e0_base AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {{minsup}}
),
{ctes}
SELECT part, CAST(count(*) AS BIGINT) AS core_degree FROM (
  SELECT u AS part FROM e{KCORE_ROUNDS - 1}
  UNION ALL
  SELECT v AS part FROM e{KCORE_ROUNDS - 1}
) GROUP BY part
"""


PART_KCORE_SQL = _kcore_sql()
