"""Iterative graph operators for dedup clustering.

Near-dup detection yields PAIRS; actually deduplicating a corpus needs the
transitive closure — duplicate CLUSTERS — so "keep one canonical doc per
cluster" is well-defined even for chains (A~B, B~C, A≁C).  That closure is
connected components, computed here as iterative min-label propagation in
pure DataFrame ops:

- each vertex starts labeled with its own id;
- each round, every vertex takes ``min(own label, neighbors' labels)``;
- fixed point = every vertex holds the min id of its component.

Scale design:
- each round is one shuffle join + one aggregate — fully distributed; the
  driver only checks the convergence counter;
- ``localCheckpoint`` truncates lineage per round (an iterative plan that
  grows by two joins per round melts the optimizer after ~15 rounds);
- rounds needed = graph diameter.  Near-dup graphs are short chains, so
  this converges in 2-4 rounds.  For adversarial diameters (long chains)
  :func:`connected_components_alternating` implements the
  large-star/small-star algorithm (Kiveris et al., "Connected Components
  in MapReduce and Beyond", SoCC'14) at O(log n) rounds with the same
  per-round primitives — the catalog's clustering queries run on it;
  both produce identical labels (property-tested).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns (id, component) where ``component`` is the minimum vertex id
    reachable from ``id``.  Vertices = every endpoint in ``edges``
    (callers wanting singletons union them in afterwards — a left join
    with ``coalesce(component, id)``).

    Raises ``RuntimeError`` if the propagation has not converged after
    ``max_iter`` rounds (diameter > max_iter) rather than silently
    returning a partial clustering.
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    # dedup the symmetric edge list once: repeated edges would only
    # re-prove the same min and inflate every round's join
    sym = sym.distinct().localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("_nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("_nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()  # truncate lineage; materializes eagerly
        )
        n_changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no fixed point after {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def prepare_pagerank_edges(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """The reusable (and PERSISTABLE) half of :func:`pagerank`: distinct
    directed edges annotated with the source's outdegree.  The degree
    is a ``groupBy(e_src).count()`` joined back onto the edges rather
    than a per-src count window — measured identical at sf0.1 (1.2 s
    both), but the aggregate gets MAP-SIDE partial combining and the
    join gets AQE skew splitting, while a window must buffer a hub
    vertex's entire edge group in one task: at 10⁹ edges with a
    power-law degree distribution the window shape is an OOM, the
    agg+join shape degrades gracefully (the degree table is
    vertex-sized, so the join typically broadcasts).  Callers that mine
    edges from a large join can commit this frame as a stamped snapshot
    (``versioned.stamped_snapshot``) and hand it back via
    ``pagerank(..., prepared=True)`` — the edge-with-degree list is a
    graph INDEX artifact, built once per corpus generation and served
    many times."""
    e = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst")
    ).distinct()
    deg = e.groupBy("e_src").agg(F.count("*").alias("_deg"))
    return e.join(deg, "e_src")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping: float = 0.85,
    checkpoint_interval: int = 8,
    prepared: bool = False,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (simplified:
    dangling mass is dropped, the standard power-iteration shortcut).

    rank_{i+1}(v) = (1-d)/N + d · Σ_{u→v} rank_i(u) / outdeg(u)

    Each iteration is one join + one aggregate + one left join.  The
    edge-with-outdegree frame is built ONCE
    (:func:`prepare_pagerank_edges` — r16, outdeg was re-joined per
    round), and the rounds chain LAZILY into one
    declarative plan: for a fixed small
    ``n_iter``, per-round ``localCheckpoint`` materialization cost ~2×
    the whole computation at sf0.1 (measured 3.26 s → 1.56 s), whereas
    the single 5-round DAG lets Catalyst/AQE pick one strategy per
    stage (the rank frame is vertex-sized, so the per-round join
    typically broadcasts).  ``checkpoint_interval`` guards deep
    iteration counts: every that-many rounds the rank frame is
    localCheckpoint'ed to truncate lineage — at the default 8, a
    5-round call never checkpoints, a 50-round call stays
    plan-size-bounded.  N is a single driver-side ``count()`` of the
    vertex set — a scalar constant folded into the expression, not a
    data collect.  Fixed ``n_iter`` (rather than convergence-check)
    keeps the result engine-reproducible, which is what the
    unrolled-CTE oracle replays.

    ``prepared=True`` declares ``edges`` is ALREADY the output of
    :func:`prepare_pagerank_edges` (distinct ``(e_src, e_dst)`` rows
    carrying ``_deg``) AND cheap to iterate on — served from a
    committed snapshot or already checkpointed — so the distinct+degree
    pass AND the checkpoint are both skipped: the n_iter rounds scan
    the caller's frame as-is.  A non-distinct or wrongly-degreed
    prepared frame is the caller's correctness bug, exactly like any
    other index-artifact contract.  ``nodes`` (single ``id`` column,
    distinct, same materialization contract) optionally skips the
    vertex-set derivation too — callers persisting the edge index can
    persist the vertex list beside it and serve both from one scan."""
    if checkpoint_interval < 1:
        raise ValueError("checkpoint_interval must be >= 1")
    # outdeg rides each edge row from the start, so the rounds join ONE
    # pre-materialized (e_src, e_dst, _deg) frame against the current
    # ranks instead of re-joining outdeg every round.
    ew = (
        edges.select("e_src", "e_dst", "_deg")
        if prepared
        else prepare_pagerank_edges(edges, src, dst).localCheckpoint()
    )
    # every vertex appears in ew (a src row carries its own edges; a
    # sink appears as some row's dst), so the vertex set derives from
    # the checkpointed frame — no second pass over the raw edges
    nodes = (
        nodes.select("id")
        if nodes is not None
        else ew.select(
            F.explode(F.array("e_src", "e_dst")).alias("id")
        )
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(n_iter):
        contribs = (
            ew.join(ranks, ew.e_src == ranks.id)
            .groupBy(F.col("e_dst").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_in"))
        )
        ranks = nodes.join(contribs, "id", "left").select(
            "id",
            (
                F.lit((1.0 - damping) / n)
                + damping * F.coalesce(F.col("_in"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_interval == 0 and i != n_iter - 1:
            ranks = ranks.localCheckpoint()
    # LAZY checkpoint of the returned frame: the first action
    # materializes the rounds exactly once and pins the values, so a
    # consumer running several actions (count + collect, a retry) never
    # recomputes — and never observes bitwise-different ranks from a
    # different task-completion order of the double sums (the float
    # drift class the cross-engine determinism notes guard against).
    # Costs nothing until an action runs; the frame is vertex-sized.
    return ranks.localCheckpoint(eager=False)


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count of an undirected simple graph.

    Orients every edge low-id → high-id (so each triangle appears exactly
    once as a<b<c), then counts length-2 paths a→b→c that close with an
    a→c edge: two self-joins on the oriented edge list.

    Scale note: the classic refinement orders by DEGREE instead of id
    (node-iterator/compact-forward), which bounds the join fan-out by the
    max degree of the lower-degree endpoint — same two-join shape, swap
    the orientation key for (degree, id) when the graph has hubs."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    paths = e1.join(e2, "y")
    closed = paths.join(e3, ["x", "z"])
    return closed.agg(F.count("*").cast("long").alias("n_triangles"))


def connected_components_alternating(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log n) rounds instead of O(diameter), the upgrade the
    min-label propagation docstring promises for adversarial chain
    graphs.

    Per round (both phases are one aggregate + one join, same primitives
    as a propagation round):

    - **large-star**: per center u with m = min(N(u) ∪ {u}), re-hang
      every LARGER neighbor v > u onto m (halves long chains);
    - **small-star**: orient every edge (larger → smaller), per center u
      hang u and all its (smaller) neighbors onto the minimum.

    Fixed point = edge set stable = a star per component centered at its
    minimum id.  Returns (id, component) like
    :func:`connected_components` — byte-identical labels, different
    round complexity.  ``localCheckpoint`` truncates lineage once per
    ROUND (at the small-star output); the large-star frame chains
    lazily into the small-star phase so each round schedules one
    materialization, not two.
    """
    all_edges = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    cur = (
        all_edges.where(F.col("a") != F.col("b")).distinct().localCheckpoint()
    )
    # vertices whose ONLY edges are self-loops still belong in the output
    # (as their own singleton component) — connected_components includes
    # them via its endpoint-derived vertex set, and the two functions
    # promise identical labels; unioned in at the end.
    loop_only = (
        all_edges.where(F.col("a") == F.col("b"))
        .select("a")
        .distinct()
        .join(
            cur.select("a").unionByName(cur.select(F.col("b").alias("a"))),
            "a",
            "left_anti",
        )
        .select(F.col("a").alias("id"), F.col("a").alias("component"))
    )
    if not cur.take(1):
        return loop_only

    def edge_sig(df: DataFrame):
        return df.agg(
            F.count("*").alias("n"),
            # bit_xor: order-insensitive and overflow-free under ANSI mode
            # (a SUM of xxhash64 longs overflows); edges are distinct, so
            # xor-cancellation of repeated rows cannot occur
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]

    prev_sig = None
    prev_edges: DataFrame | None = None
    for _ in range(max_iter):
        # -- large-star: symmetrize, center on a, re-hang larger neighbors
        sym = cur.unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(F.min("b").alias("_mb"))
        m = F.least(F.col("a"), F.col("_mb"))
        large = (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            # v > u ≥ m ⇒ never a self-loop
            .select(F.col("b").alias("a"), m.alias("b"))
            .distinct()
            # NOT checkpointed (r16): the small-star phase chains onto
            # this lazily, so each round materializes ONCE at `cur` —
            # the per-phase checkpoint doubled the round's job count for
            # no lineage benefit (measured 2.24 → 1.85 s at sf0.1)
        )
        # -- small-star: orient larger→smaller, hang center + neighbors on min
        ori = large.select(
            F.greatest(F.col("a"), F.col("b")).alias("u"),
            F.least(F.col("a"), F.col("b")).alias("v"),
        ).where(F.col("u") != F.col("v"))
        mins2 = ori.groupBy("u").agg(F.min("v").alias("_mv"))
        hang_nbrs = (
            ori.join(mins2, "u")
            .where(F.col("v") != F.col("_mv"))
            .select(F.col("v").alias("a"), F.col("_mv").alias("b"))
        )
        hang_center = mins2.select(
            F.col("u").alias("a"), F.col("_mv").alias("b")
        )
        cur = hang_nbrs.unionByName(hang_center).distinct().localCheckpoint()

        sig = edge_sig(cur)
        # Signature equality is 2⁻⁶⁴-collision-probable, and a collision
        # would SILENTLY return wrong labels — so confirm the fixed point
        # with one exact set comparison, paid only at the terminal round
        # (both sides are localCheckpoint-backed; counts already agree via
        # the signature, so one-directional exceptAll suffices).
        if (
            prev_sig is not None
            and sig == prev_sig
            and not prev_edges.exceptAll(cur).take(1)
        ):
            stars = cur  # (non-min vertex, component min) star edges
            roots = stars.select(F.col("b").alias("a"), F.col("b"))
            return (
                stars.unionByName(roots)
                .distinct()
                .select(F.col("a").alias("id"), F.col("b").alias("component"))
                .unionByName(loop_only)
            )
        prev_sig = sig
        prev_edges = cur
    raise RuntimeError(
        f"connected_components_alternating: not converged after {max_iter} "
        "rounds"
    )


def khop_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "id",
) -> DataFrame:
    """Min-hop BFS distance from a seed set, bounded at ``k`` hops.

    The bounded-traversal primitive (blast-radius / neighborhood
    queries): returns ``(node, hops)`` for every vertex reachable from
    any seed within ``k`` undirected hops, ``hops`` = the MINIMUM
    distance.  Seeds themselves appear with hops 0 whether or not they
    touch an edge.

    Frontier BFS, not closure: each round joins only the NEW frontier
    against the edge table (shuffle keyed on the vertex id), anti-joins
    out already-reached vertices (so a vertex is expanded exactly once —
    the first time it is seen, which is also its min distance), and
    ``localCheckpoint``s the round result to truncate lineage.  The
    driver does one ``take(1)`` per round purely to early-exit when the
    frontier drains before ``k`` — a 1-row action, the same bounded
    convergence probe the CC loops use.  Rounds are bounded by ``k``
    regardless of graph size, and per-round state is (node, hops) rows —
    never neighbor lists.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    frontier = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint()
    )
    # ``reached`` accumulates as a FLAT union of per-round checkpointed
    # legs — each leg is materialized exactly once (checkpointing the
    # union again would rewrite all previously-reached rows every round,
    # O(k·|reached|) instead of O(Σ|frontier_h|)), and a flat union's
    # lineage grows by one leaf per round, not multiplicatively.
    legs = [frontier]
    if k > 0:  # symmetrized edges are only needed if we expand at all
        sym = (
            edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
            .unionByName(
                edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
            )
            .distinct()
            .localCheckpoint()
        )
        for h in range(1, k + 1):
            reached = reduce(DataFrame.unionByName, legs)
            nxt = (
                frontier.join(sym, frontier["node"] == sym["s"])
                .select(F.col("d").alias("node"))
                .distinct()
                .join(reached, "node", "left_anti")
                .withColumn("hops", F.lit(h))
                .localCheckpoint()
            )
            if not nxt.take(1):  # frontier drained before k hops
                break
            legs.append(nxt)
            frontier = nxt
    return reduce(DataFrame.unionByName, legs)


def cluster_keepers_by_score(
    comp: DataFrame,
    scores: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Per connected component, the member with the HIGHEST score —
    ties broken by lowest id, so selection is deterministic across
    engines and re-runs.  Input: a components frame (``id_col``,
    ``component``) and a per-member score frame (``id_col``,
    ``score_col``).  Output: one row per component with
    ``(component, keeper_<id>, n_members, keeper_<score>)``.

    The curation variant of min-id keeper selection: a near-dup
    pipeline that keeps the canonical min-id document throws away a
    higher-quality duplicate whenever ids and quality disagree; this
    picks the best-scoring member instead (Lee et al. keep-one, with
    "one" chosen by a quality signal).  Scale shape: one join on the
    member id + one hash aggregate with constant per-component state —
    the arg-max is a ``min(struct(-score, id))`` fold, never a window
    sort over members.

    UNSCORED members — no score row at all, or a NULL ``score_col`` —
    are excluded both from keeper candidacy and from ``n_members``: a
    NULL score would otherwise negate to NULL and win the ``min(struct)``
    fold NULLS-FIRST, the exact opposite of the "highest score" contract
    (and of the oracle's score DESC NULLS LAST).  A component whose
    members are ALL unscored yields no row."""
    j = comp.join(scores.where(F.col(score_col).isNotNull()), id_col)
    best = j.groupBy("component").agg(
        F.min(
            F.struct(
                (-F.col(score_col)).alias("_ns"), F.col(id_col).alias("_i")
            )
        ).alias("_best"),
        F.count("*").alias("n_members"),
    )
    return best.select(
        "component",
        F.col("_best._i").alias(f"keeper_{id_col}"),
        "n_members",
        (-F.col("_best._ns")).alias(f"keeper_{score_col}"),
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    materialize: bool = True,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007), made fully
    deterministic: labels start as node ids, and each round every node
    adopts the PLURALITY label among its neighbors, ties broken by the
    smallest label — ``min(struct(−count, label))``, the same argmin
    idiom as k-means assignment.  All updates in a round read the
    PREVIOUS round's labels (synchronous), so the trajectory is a pure
    function of the edge set and an unrolled SQL oracle replays it
    exactly.  (Classic LPA randomizes update order precisely to escape
    bipartite oscillation; determinism is the price of replayability —
    callers clustering bipartite graphs should prefer
    ``connected_components_alternating``.)

    Output: ``(id, label)`` — nodes sharing a label after ``n_iter``
    rounds are a community.  Scale shape per round: one join of the
    (undirected) edge list with the d-col label frame + one
    constant-state (node, label) count + one argmin aggregate — the
    PageRank shuffle shape with labels instead of ranks;
    ``materialize`` lazily localCheckpoints each round's labels (the
    unrolled-recurrence lesson from MMR / power iteration)."""
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    lab = und.select(F.col("a").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    for _ in range(n_iter):
        nb = und.join(
            lab.select(F.col("id").alias("b"), "label"), "b"
        )
        new = (
            nb.groupBy("a", "label")
            .agg(F.count("*").alias("c"))
            .groupBy("a")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("label"))
                ).alias("_m")
            )
            .select(
                F.col("a").alias("id"), F.col("_m.label").alias("label")
            )
        )
        lab = new.localCheckpoint(eager=False) if materialize else new
    return lab


def markov_stationary(
    trans: DataFrame,
    n_iter: int = 4,
    pscale: int = 1_000_000,
    src: str = "type_from",
    dst: str = "type_to",
    count_col: str = "n_trans",
    materialize: bool = True,
) -> DataFrame:
    """Stationary distribution of an empirical Markov chain by
    fixed-point power iteration — the integer recurrence of
    ``decomposition.power_iteration_pc1`` applied to a (row-stochastic)
    transition-count matrix, so the iterative computation replays
    bit-for-bit on any engine.

    The chain is restricted to states WITH outgoing transitions (both
    endpoints in the from-set): an absorbing sink has no row to
    normalize and would swallow probability mass with no outflow —
    the restriction is deterministic and stated in the oracle.  Each
    round computes rawₜ = Σₛ ⌊πₛ·C(s,t)/Rₛ⌋ (per-edge flooring against
    the source's row sum — ≤1 ulp of the 1/pscale grid per edge), then
    renormalizes π′ = ⌊raw·pscale/Σraw⌋.

    Output: ``(state, pi_q)`` — ``pi_q/pscale`` sums to ~1.  Scale
    shape: the transition matrix is |states|² rows, the iteration never
    touches the event stream (that happened once, in the count
    aggregate)."""
    from hfp_loader_spark.operators.decomposition import _floor_div

    dec = "decimal(38,0)"
    states = trans.select(F.col(src).alias("state")).distinct()
    c = (
        trans.join(
            states.select(F.col("state").alias(dst)), dst
        )  # drop edges into absorbing sinks
        .select(
            F.col(src).alias("s"),
            F.col(dst).alias("t"),
            F.col(count_col).cast(dec).alias("c"),
        )
    )
    r = c.groupBy("s").agg(F.sum("c").alias("rsum"))
    cm = c.join(F.broadcast(r), "s")
    pi = states.select(
        F.col("state").alias("s"), F.lit(pscale).cast(dec).alias("p")
    )
    for _ in range(n_iter):
        raw = (
            cm.join(F.broadcast(pi), "s")
            .select(
                F.col("t"),
                _floor_div(F.col("p") * F.col("c"), F.col("rsum")).alias(
                    "m"
                ),
            )
            .groupBy("t")
            .agg(F.sum("m").alias("raw"))
        )
        tot = raw.agg(
            F.greatest(F.sum("raw"), F.lit(1).cast(dec)).alias("tot")
        )
        pi = raw.crossJoin(F.broadcast(tot)).select(
            F.col("t").alias("s"),
            _floor_div(
                F.col("raw") * F.lit(pscale).cast(dec), F.col("tot")
            ).alias("p"),
        )
        if materialize:
            pi = pi.localCheckpoint(eager=False)
    return pi.select(
        F.col("s").alias("state"), F.col("p").cast("long").alias("pi_q")
    )
