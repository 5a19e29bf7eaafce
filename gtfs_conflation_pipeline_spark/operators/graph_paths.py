"""Pass B — graph-based path choice (reference stage 4, chooseShstMatchesForShape).

Faithful re-expression of the reference's per-segment pipeline:

  build subgraph     nodes are EXACT rounded coordinates (string equality —
                     buildShstMatchSubGraphsPerGtfsShapeSegment.js:84-93),
                     edges are candidate match geometries weighted by
                     length_km x RMSD meters (:34-44)
  components         connected components of the undirected view
  dijkstra paths     per component: min-weight paths from every source
                     (in-degree 0) to every sink (out-degree 0)
                     (createPathLineStrings.js:21,47-78)
  merge fixpoint     geospatial merge (end->start <= 2 m, loop rejection;
                     mergeLineStringsGeospatially.js) + metadata merge
                     (shared match-id prefix/suffix;
                     mergePathLineStringsUsingMetadata.js), repeated to a
                     fixpoint; paths whose match-id set is a subset of
                     another's are dropped (unionPathLineStrings.js:13-135)
  annealed choice    axiomatic paths must satisfy (len >= min_len,
                     len-diff ratio <= max_ratio, gap <= max_gap); if none
                     qualify, thresholds relax by sqrt(2) per round within
                     bounds (chooseOptimalShstMatches/index.js:114-219,
                     constants.js:1-4)

Everything here is shape/segment-local (no cross-shape state), so in the
Spark plan it runs inside a grouped kernel with parallelism = number of
GTFS segments. The default engine chooser (spatial_join.choose_matches)
is the scale path; `choose_paths_for_segment` is the full-fidelity
reference-semantics path — on well-behaved candidates the two agree
(asserted in tests)."""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import kernels as K

MERGE_GAP_KM = 0.002  # 2 m (mergeLineStringsGeospatially.js)
SQRT2 = 1.4142135623730951

# threshold ladder (constants.js:1-4 shape: start -> bound, relaxed by sqrt2)
MIN_PATH_LEN_KM = (0.1, 0.005)  # start, floor (relaxed by division)
MAX_LEN_RATIO = (0.05, 0.8)  # start, ceiling (relaxed by multiplication)
MAX_GAP_KM = (0.002, 0.1)  # start, ceiling


@dataclass
class MatchEdge:
    match_id: int
    shst_reference: str
    xs: np.ndarray
    ys: np.ndarray
    weight: float = 0.0

    def start_key(self) -> tuple:
        return (round(self.xs[0], 6), round(self.ys[0], 6))

    def end_key(self) -> tuple:
        return (round(self.xs[-1], 6), round(self.ys[-1], 6))


@dataclass
class Path:
    match_ids: tuple
    xs: np.ndarray
    ys: np.ndarray

    @property
    def length_km(self) -> float:
        return K.polyline_length_km(self.xs, self.ys)


def edge_weight(edge_xs, edge_ys, seg_xs, seg_ys) -> float:
    """length x RMSD-meters (buildShstMatchSubGraphsPerGtfsShapeSegment.js:34-44)."""
    return K.polyline_length_km(edge_xs, edge_ys) * max(
        K.rmsd_m(np.asarray(edge_xs), np.asarray(edge_ys), seg_xs, seg_ys), 1e-9
    )


def build_edges(matches: list[dict], seg_xs, seg_ys) -> list[MatchEdge]:
    edges = []
    for m in matches:
        e = MatchEdge(
            match_id=m["match_id"],
            shst_reference=m["shst_reference"],
            xs=np.asarray(m["xs"], dtype=np.float64),
            ys=np.asarray(m["ys"], dtype=np.float64),
        )
        if e.xs.size < 2:
            continue
        e.weight = edge_weight(e.xs, e.ys, seg_xs, seg_ys)
        edges.append(e)
    return edges


def connected_components(edges: list[MatchEdge]) -> list[list[MatchEdge]]:
    """Undirected components over exact-coordinate node identity."""
    parent: dict = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for e in edges:
        for k in (e.start_key(), e.end_key()):
            parent.setdefault(k, k)
        union(e.start_key(), e.end_key())
    comps: dict = {}
    for e in edges:
        comps.setdefault(find(e.start_key()), []).append(e)
    return list(comps.values())


def dijkstra_paths(comp: list[MatchEdge]) -> list[Path]:
    """Min-weight source->sink paths (createPathLineStrings.js:21,47-78).
    Sources = nodes with no incoming edge; sinks = no outgoing edge.
    Deterministic: ties broken by node key / match id order."""
    out_edges: dict = {}
    in_deg: dict = {}
    nodes = set()
    for e in sorted(comp, key=lambda e: e.match_id):
        out_edges.setdefault(e.start_key(), []).append(e)
        in_deg[e.end_key()] = in_deg.get(e.end_key(), 0) + 1
        nodes.add(e.start_key())
        nodes.add(e.end_key())
    sources = sorted(n for n in nodes if in_deg.get(n, 0) == 0)
    sinks = sorted(n for n in nodes if not out_edges.get(n))
    if not sources:  # cyclic component: fall back to every node as source
        sources = sorted(nodes)
    paths: list[Path] = []
    for src in sources:
        # dijkstra from src
        dist = {src: 0.0}
        prev_edge: dict = {}
        pq = [(0.0, src)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, float("inf")):
                continue
            for e in out_edges.get(u, []):
                v = e.end_key()
                nd = d + e.weight
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    prev_edge[v] = e
                    heapq.heappush(pq, (nd, v))
        for snk in sinks:
            if snk == src or snk not in dist:
                continue
            chain: list[MatchEdge] = []
            node = snk
            while node != src:
                e = prev_edge.get(node)
                if e is None:
                    chain = []
                    break
                chain.append(e)
                node = e.start_key()
            if not chain:
                continue
            chain.reverse()
            xs = np.concatenate([chain[0].xs] + [e.xs[1:] for e in chain[1:]])
            ys = np.concatenate([chain[0].ys] + [e.ys[1:] for e in chain[1:]])
            paths.append(Path(tuple(e.match_id for e in chain), xs, ys))
    return paths


def merge_geospatial(a: Path, b: Path) -> Path | None:
    """end(a)->start(b) within 2 m => concatenate; loop (shared match ids or
    b ending at a's start) rejected (mergeLineStringsGeospatially.js:6-105)."""
    if set(a.match_ids) & set(b.match_ids):
        return None
    gap = float(K.haversine_km(a.xs[-1], a.ys[-1], b.xs[0], b.ys[0]))
    if gap > MERGE_GAP_KM:
        return None
    if (
        abs(b.xs[-1] - a.xs[0]) < 1e-9 and abs(b.ys[-1] - a.ys[0]) < 1e-9
    ):  # would close a loop
        return None
    return Path(
        a.match_ids + b.match_ids,
        np.concatenate([a.xs, b.xs]),
        np.concatenate([a.ys, b.ys]),
    )


def merge_by_metadata(a: Path, b: Path) -> Path | None:
    """Paths overlapping on a suffix-of-a == prefix-of-b match-id run merge
    into one (mergePathLineStringsUsingMetadata.js:9-197)."""
    amid, bmid = a.match_ids, b.match_ids
    max_k = min(len(amid), len(bmid))
    for k in range(max_k, 0, -1):
        if amid[-k:] == bmid[:k]:
            if set(amid[:-k]) & set(bmid[k:]):
                return None
            if k == len(bmid):  # b fully contained in a's suffix
                return Path(amid, a.xs, a.ys)
            # geometric stitch: the overlapping edges share EXACT coords, so
            # a's last vertex appears in b; append b's remainder beyond it
            hits = np.where(
                (np.abs(b.xs - a.xs[-1]) < 1e-12) & (np.abs(b.ys - a.ys[-1]) < 1e-12)
            )[0]
            if hits.size == 0:
                return None  # geometry disagrees with metadata — refuse merge
            j = int(hits[0])
            return Path(
                amid + bmid[k:],
                np.concatenate([a.xs, b.xs[j + 1 :]]),
                np.concatenate([a.ys, b.ys[j + 1 :]]),
            )
    return None


def union_paths(paths: list[Path], max_rounds: int = 8) -> list[Path]:
    """Merge fixpoint + subset drop (unionPathLineStrings.js:13-135).
    Deterministic order: paths sorted by (match_ids)."""
    paths = sorted(paths, key=lambda p: p.match_ids)
    for _ in range(max_rounds):
        merged_any = False
        out: list[Path] = []
        used = [False] * len(paths)
        for i, a in enumerate(paths):
            if used[i]:
                continue
            cur = a
            for j, b in enumerate(paths):
                if i == j or used[j]:
                    continue
                m = merge_geospatial(cur, b) or merge_by_metadata(cur, b)
                if m is not None:
                    cur = m
                    used[j] = True
                    merged_any = True
            used[i] = True
            out.append(cur)
        paths = sorted(out, key=lambda p: p.match_ids)
        if not merged_any:
            break
    # subset drop: match-id set contained in another path's set
    keep = []
    sets = [set(p.match_ids) for p in paths]
    for i, p in enumerate(paths):
        if any(i != j and sets[i] < sets[j] for j in range(len(paths))):
            continue
        keep.append(p)
    return keep


MAX_OVERLAP_THLD_KM = 0.002  # findNonAxiomaticPaths.js:10 (2 meters)
# Exact combo choice up to here; capped longest-path fallback above. The
# branch-and-bound search below explores the same solution space as the
# reference's 2^n reduce but prunes any fork subtree whose optimistic bound
# (current total + all remaining lengths) can't beat the incumbent, so
# realistic length distributions stay sub-second well past the old full-
# enumeration cap of 15 (worst case — all lengths tied — is still 2^forks,
# the hazard the reference itself flags at :218-222).
EXACT_COMBO_MAX_N = 24


def exact_combo_select(paths: list[Path]) -> list[Path]:
    """Reference-exact non-axiomatic path-combination choice
    (findNonAxiomaticPaths.js:64-242): enumerate the satisfiable
    include/exclude combos under pairwise-overlap constraints and keep the
    max-total-length combo.

    Combo construction (the reference's fork-and-constrain reduce,
    :95-216): paths are visited in order; a path overlapping (> 2 m) any
    EARLIER path is included in a combo iff every such constrainer is
    excluded there — overlap measured as max over the two lines of the
    SUM of cospatiality-entry extents (:115-128); a path that
    instead overlaps only LATER paths forks every combo into
    include/exclude; an unconstrained path is included everywhere. A path
    overlapping nothing has a null cospatiality row (:85-89) and is always
    included. The reference itself flags the O(2^n) cost (:91-93) —
    callers gate on EXACT_COMBO_MAX_N and fall back to the capped
    longest-path choice above it."""
    n = len(paths)
    if n <= 1:
        return list(paths)
    # pairwise cospatiality ENTRY LISTS via the two-sided kernel (the
    # reference's getCospatialityOfLinestrings return value: one entry per
    # (S-part, T-part) intersection pair; null when no pair survives the
    # 2 m part filter). The two consumers below read them ASYMMETRICALLY,
    # exactly like the reference: constrainer checks SUM the extents over
    # all entries per side and take the max of the two sums
    # (findNonAxiomaticPaths.js:115-128); fork checks read only the FIRST
    # entry's extents (:175-180).
    ov: list[list[list | None]] = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            c = K.cospatiality_two_sided(
                paths[i].xs, paths[i].ys, paths[j].xs, paths[j].ys
            )
            if c is not None and c["entries"]:
                ov[i][j] = ov[j][i] = c["entries"]
    has_overlap = [
        any(ov[i][j] is not None for j in range(n) if j != i) for i in range(n)
    ]

    def _constrainer_overlap(entries: list) -> float:
        s_sum = sum(e["a_end_km"] - e["a_start_km"] for e in entries)
        t_sum = sum(e["b_end_km"] - e["b_start_km"] for e in entries)
        return max(s_sum, t_sum)

    def _fork_overlap(entries: list) -> float:
        first = entries[0]
        return max(
            first["a_end_km"] - first["a_start_km"],
            first["b_end_km"] - first["b_start_km"],
        )

    # STRUCTURAL pass — each path's role is a function of the overlap
    # matrix alone, never of the include/exclude decisions, so it is fixed
    # before the search: 'c' = constrained by earlier overlapping paths
    # (deterministic: included iff every constrainer excluded, :129-170),
    # 'f' = forks every combo (overlaps only later paths, :171-212),
    # 'free' = included everywhere (:95-113 + the null-cospatiality row).
    kinds: list[tuple] = []
    for i in range(n):
        constrainers: list[int] = []
        if has_overlap[i]:
            for j in range(i):
                if not has_overlap[j]:
                    continue
                lij = ov[j][i]
                if lij is not None and _constrainer_overlap(lij) > MAX_OVERLAP_THLD_KM:
                    constrainers.append(j)
        if constrainers:
            kinds.append(("c", tuple(constrainers)))
        elif any(
            has_overlap[j]
            and ov[j][i] is not None
            and _fork_overlap(ov[j][i]) > MAX_OVERLAP_THLD_KM
            for j in range(i + 1, n)
        ):
            kinds.append(("f",))
        else:
            kinds.append(("free",))

    # BRANCH-AND-BOUND over the fork decisions. The reference's combo list
    # order is descending-lexicographic in (f_k, ..., f_1) with 1 before 0
    # (each fork appends the exclude copies AFTER every existing combo), and
    # its strictly-greater max keeps the FIRST max — so the winner is the
    # max of the key (total_length, f_k, ..., f_1). We search the same tree
    # depth-first, accumulate the total in the same ascending-index float
    # order (bit-identical sums), keep the explicit key for ties, and prune
    # a subtree only when even including every remaining path cannot
    # STRICTLY beat the incumbent value (ties must survive to the key
    # comparison).
    lens = [p.length_km for p in paths]
    suffix = [0.0] * (n + 1)
    for i in range(n - 1, -1, -1):
        suffix[i] = suffix[i + 1] + lens[i]

    best_v = float("-inf")
    best_key: tuple | None = None
    best_combo: list[int] | None = None
    combo = [0] * n
    fork_dec: list[int] = []

    def dfs(i: int, val: float) -> None:
        nonlocal best_v, best_key, best_combo
        # Conservative prune (round-7 ADVICE fix): `suffix` accumulates
        # right-to-left while the real combo value accumulates left-to-right,
        # so val + suffix[i] can undershoot the achievable sum by ulps and a
        # strict < could prune a tie whose key should win. One ulp of
        # headroom keeps the bound an upper estimate; correctness-safe (a
        # looser bound only explores more).
        if math.nextafter(val + suffix[i], math.inf) < best_v:
            return
        if i == n:
            key = tuple(reversed(fork_dec))
            if val > best_v or (
                val == best_v and (best_key is None or key > best_key)
            ):
                best_v, best_key, best_combo = val, key, combo.copy()
            return
        k = kinds[i]
        if k[0] == "c":
            inc = 1 if all(combo[j] == 0 for j in k[1]) else 0
            combo[i] = inc
            dfs(i + 1, val + lens[i] if inc else val)
        elif k[0] == "free":
            combo[i] = 1
            dfs(i + 1, val + lens[i])
        else:  # fork: include-first finds strong incumbents early
            combo[i] = 1
            fork_dec.append(1)
            dfs(i + 1, val + lens[i])
            combo[i] = 0
            fork_dec[-1] = 0
            dfs(i + 1, val)
            fork_dec.pop()
        combo[i] = 0

    dfs(0, 0.0)
    assert best_combo is not None
    return [p for inc, p in zip(best_combo, paths) if inc]


def choose_paths_for_segment(
    matches: list[dict], seg_xs, seg_ys
) -> list[Path]:
    """Full Pass-B choice for one GTFS segment: subgraph -> components ->
    dijkstra -> union fixpoint -> annealed axiomatic selection."""
    seg_xs = np.asarray(seg_xs, dtype=np.float64)
    seg_ys = np.asarray(seg_ys, dtype=np.float64)
    seg_len = K.polyline_length_km(seg_xs, seg_ys)
    edges = build_edges(matches, seg_xs, seg_ys)
    if not edges:
        return []
    paths: list[Path] = []
    for comp in connected_components(edges):
        paths.extend(dijkstra_paths(comp))
    if not paths:  # single-edge components with cycles
        paths = [Path((e.match_id,), e.xs, e.ys) for e in edges]
    paths = union_paths(paths)

    # threshold annealing (chooseOptimalShstMatches/index.js:114-219)
    min_len, min_len_floor = MIN_PATH_LEN_KM
    max_ratio, max_ratio_ceil = MAX_LEN_RATIO
    max_gap, max_gap_ceil = MAX_GAP_KM
    for _round in range(12):
        chosen = []
        for p in sorted(paths, key=lambda p: (-p.length_km, p.match_ids)):
            plen = p.length_km
            if plen < min_len:
                continue
            if seg_len > 0 and abs(plen - seg_len) / seg_len > max_ratio:
                continue
            gap = float(
                K.haversine_km(seg_xs[0], seg_ys[0], p.xs[0], p.ys[0])
            )
            if gap > max_gap:
                continue
            chosen.append(p)
        if chosen:
            return chosen
        min_len = max(min_len / SQRT2, min_len_floor)
        max_ratio = min(max_ratio * SQRT2, max_ratio_ceil)
        max_gap = min(max_gap * SQRT2, max_gap_ceil)
    # non-axiomatic fallback after the ladder is exhausted
    # (findNonAxiomaticPaths.js:64-242): where the reference is tractable
    # (n <= EXACT_COMBO_MAX_N) run its EXACT 2^n combo enumeration; above
    # that, the capped longest-path choice (the O(2^n) hazard the reference
    # itself flags at :218-222 — it has no cap, we bound the blowup)
    ordered = sorted(paths, key=lambda p: (-p.length_km, p.match_ids))
    if len(ordered) <= EXACT_COMBO_MAX_N:
        return exact_combo_select(ordered)
    return ordered[:1]


# ---------------------------------------------------------------------------
# Spark wiring: the reference's gtfs_shape_shst_match_paths table
# (GtfsOsmNetworkDAO/loaders.js:88-157 — paths decomposed into
# (path_index, path_edge_index) rows per GTFS shape segment)
# ---------------------------------------------------------------------------

MATCH_PATHS_ROW = T.StructType(
    [
        T.StructField("path_index", T.IntegerType()),
        T.StructField("path_edge_index", T.IntegerType()),
        T.StructField("match_id", T.LongType()),
        T.StructField("shst_reference", T.StringType()),
        T.StructField("path_len_km", T.DoubleType()),
    ]
)


def match_paths_table(
    refined: DataFrame, segments: DataFrame, osm: DataFrame
) -> DataFrame:
    """Pass-B wired into the Spark plan: per GTFS shape segment, run the
    full subgraph -> components -> Dijkstra -> union-fixpoint -> annealed
    choice chain over that segment's refined corridor candidates, and emit
    the reference's path decomposition (loaders.js:113-156):
    one row per (shape_id, shape_index, path_index, path_edge_index).

    Each candidate's match geometry is the candidate's matched SLICE of the
    OSM line ([osm_start, osm_end] via line_slice_along) — the analog of
    the shst match result geometry the reference builds edges from.

    Physical shape (the measured-fast pattern): candidates are gathered per
    segment with ONE collect_list shuffle and the whole per-segment chain
    runs inside a single SCALAR pandas_udf (one Python call per Arrow
    batch), then explodes back to rows. Parallelism = number of GTFS
    segments; no cross-segment state, so this scales exactly like the
    flagship chooser."""
    o_geom = osm.select(
        "segment_id", F.col("xs").alias("o_xs"), F.col("ys").alias("o_ys")
    )
    g_geom = segments.select(
        "shape_id", "shape_index", F.col("xs").alias("g_xs"), F.col("ys").alias("g_ys")
    )
    cand = (
        refined.select(
            "shape_id", "shape_index", "segment_id", "shst_reference",
            "osm_start", "osm_end",
        )
        .dropDuplicates(["shape_id", "shape_index", "segment_id"])
        .join(o_geom, "segment_id")
        .join(g_geom, ["shape_id", "shape_index"])
    )
    par = refined.sparkSession.sparkContext.defaultParallelism
    grouped = (
        cand.groupBy("shape_id", "shape_index")
        .agg(
            F.collect_list(
                F.struct(
                    "segment_id", "shst_reference", "osm_start", "osm_end",
                    "o_xs", "o_ys",
                )
            ).alias("cands"),
            F.first("g_xs").alias("g_xs"),
            F.first("g_ys").alias("g_ys"),
        )
        .repartition(par)
    )

    @F.pandas_udf(T.ArrayType(MATCH_PATHS_ROW))
    def decompose(cands: pd.Series, gxs: pd.Series, gys: pd.Series) -> pd.Series:
        out = []
        for lst, gx, gy in zip(cands, gxs, gys):
            ms, refs = [], {}
            for c in lst:
                exs, eys = K.line_slice_along(
                    np.asarray(c["o_xs"]), np.asarray(c["o_ys"]),
                    float(c["osm_start"]), float(c["osm_end"]),
                )
                ms.append(
                    {
                        "match_id": int(c["segment_id"]),
                        "shst_reference": c["shst_reference"],
                        "xs": exs,
                        "ys": eys,
                    }
                )
                refs[int(c["segment_id"])] = c["shst_reference"]
            paths = choose_paths_for_segment(ms, np.asarray(gx), np.asarray(gy))
            rows = []
            for pi, p in enumerate(paths):
                plen = p.length_km
                for ei, mid in enumerate(p.match_ids):
                    rows.append(
                        {
                            "path_index": pi,
                            "path_edge_index": ei,
                            "match_id": mid,
                            "shst_reference": refs[mid],
                            "path_len_km": plen,
                        }
                    )
            out.append(rows)
        return pd.Series(out)

    return (
        grouped.withColumn("r", F.explode(decompose("cands", "g_xs", "g_ys")))
        .select(
            "shape_id",
            "shape_index",
            F.col("r.path_index").alias("path_index"),
            F.col("r.path_edge_index").alias("path_edge_index"),
            F.col("r.match_id").alias("match_id"),
            F.col("r.shst_reference").alias("shst_reference"),
            F.col("r.path_len_km").alias("path_len_km"),
        )
    )
