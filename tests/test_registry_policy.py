"""Round-process invariants on the query registry (r8 verdict asks #3/#6).

These tests make the per-round discipline mechanical instead of manual:

1. Every gated query with NO committed verification evidence (not present
   in any committed ``CORRECTNESS_r*.json`` driver window nor any
   ``FULLCHECK_r*.json`` full-battery artifact) must be listed in
   ``_CHANGED_THIS_ROUND`` — i.e., brand-new queries cannot bypass the
   driver's priority correctness window the way r8's cusum/fs_weights/
   rouge_bigram did.
2. The count-bearing artifacts (COVERAGE.md, README.md) must agree with
   the live registry size — they shipped stale two rounds running.
3. Hygiene: the changed list and the never-sampled backlog only name
   real registry entries, and the backlog names only gated ones.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def registry():
    from ups_crossref_etl_spark.plans.registry import (
        _CHANGED_THIS_ROUND,
        _NEVER_DRIVER_SAMPLED,
        load_all,
    )

    return load_all(), list(_CHANGED_THIS_ROUND), list(_NEVER_DRIVER_SAMPLED)


def _committed_evidence_names() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        names |= set(json.load(open(path)).keys())
    for path in glob.glob(os.path.join(ROOT, "FULLCHECK_r*.json")):
        data = json.load(open(path))
        names |= set(data.get("queries", {}).keys())
    return names


def test_new_queries_are_in_changed_list(registry):
    specs, changed, _ = registry
    gated = {n for n, s in specs.items() if s.gate}
    evidence = _committed_evidence_names()
    unverified = gated - evidence
    missing = sorted(unverified - set(changed))
    assert not missing, (
        "gated queries with zero committed verification evidence must be "
        f"in _CHANGED_THIS_ROUND so the driver window samples them: {missing}"
    )


def test_coverage_md_count_matches_registry(registry):
    specs, _, _ = registry
    first = open(os.path.join(ROOT, "COVERAGE.md")).read().split("\n\n")[1]
    m = re.search(r"^(\d+) registry queries", first)
    assert m, "COVERAGE.md must open with '<N> registry queries'"
    assert int(m.group(1)) == len(specs), (
        f"COVERAGE.md says {m.group(1)} queries but the registry has "
        f"{len(specs)} — rerun tools/dump_coverage.py"
    )


def test_readme_count_matches_registry(registry):
    specs, _, _ = registry
    text = open(os.path.join(ROOT, "README.md")).read()
    m = re.search(r"registry \((\d+) queries", text)
    assert m, "README.md must state the registry query count"
    assert int(m.group(1)) == len(specs), (
        f"README.md says {m.group(1)} queries but the registry has "
        f"{len(specs)} — update the README count"
    )


def test_fullcheck_current_round_covers_gated_registry(registry):
    """r9 verdict #8 — the missing half of the invariant: the CURRENT
    round's committed FULLCHECK artifact must name every gated registry
    entry, so a query registered after the final FULLCHECK refresh can't
    ship without full-battery evidence (the historical-artifact check in
    test_new_queries_are_in_changed_list accepts any old round's file).
    Workflow consequence: refresh FULLCHECK_r{N}.json AFTER the last
    registry change of the round (tools/check_queries.py <sf_dir>
    --json FULLCHECK_r{N}.json).
    """
    from ups_crossref_etl_spark.plans.registry import _ROUND

    specs, _, _ = registry
    gated = {n for n, s in specs.items() if s.gate}
    path = os.path.join(ROOT, f"FULLCHECK_r{_ROUND:02d}.json")
    assert os.path.exists(path), (
        f"FULLCHECK_r{_ROUND:02d}.json is missing — the full battery must "
        "be run and committed every round, after the last registry change"
    )
    data = json.load(open(path))
    names = set(data.get("queries", {}).keys())
    missing = sorted(gated - names)
    assert not missing, (
        "gated queries absent from the current round's FULLCHECK artifact "
        f"(registered after the last refresh?): {missing}"
    )
    red = sorted(
        n
        for n in gated
        if data["queries"].get(n, {}).get("status") != "pass"
    )
    assert not red, f"gated queries not passing in FULLCHECK: {red}"


def test_bench_tiers_name_real_entries(registry):
    """Every bench CORE/EXTENDED name must exist in the registry — a
    typo here silently drops a query from the timed battery (the error
    path records it, but only at run time)."""
    import bench

    specs, _, _ = registry
    missing = [n for n in bench.CORE + bench.EXTENDED if n not in specs]
    assert not missing, f"bench tier names not in registry: {missing}"


#: Mechanical quiet-box bar (r12 verdict #2): committed measurement
#: artifacts carrying scale/perf claims must have been captured with the
#: contention sentinel at or under these bounds (quiet box ≈ 0.65-0.7
#: pre / 0.3-0.4 post; the bar leaves headroom for honest jitter while
#: rejecting the 0.8-1.03 contended captures that shipped in r12).
_SENTINEL_PRE_MAX = 0.9
_SENTINEL_POST_MAX = 0.5

#: SCALE_PROBE entries captured BEFORE the sentinel bar was mechanized
#: (rounds ≤12) — grandfathered explicitly by name; every entry touched
#: from round 13 on must carry quiet sentinel stamps or the policy test
#: fails. Re-capturing a legacy probe quiet? Remove its name here.
_LEGACY_PROBES = frozenset({
    "adamic_adar", "adamic_adar_capped", "als_bound", "bh_adjust",
    "bigram_nll", "bloom_probe", "bm25_topk", "bounded_walks",
    "bpe_encode", "bruteforce_topk", "clustering_coefficient",
    "cms_build_estimate", "cohort_retention", "containment_join",
    "contamination_probe", "corpus_pipeline", "corr_matrix", "cox_multi",
    "dsir_select", "durbin_watson", "exact_dedup", "fuzzy_linkage",
    "hits_2iter", "hll_sketch_rollup", "hybrid_skew_join",
    "incremental_dedup", "interleaved_order", "item_cosine", "kcore",
    "kendall_tau_capped", "keyness_g2", "ktruss", "ktruss_decade",
    "label_propagation_3r", "late_arrival_audit", "mad_outliers",
    "mann_whitney_midranks", "max_coverage_select", "minhash_candidates",
    "misra_gries", "neighbor_jaccard_capped", "ngram_novelty", "pacf",
    "pack_sequences", "pagerank_3iter", "percent_rank_unique",
    "permutation_test", "poisson_bootstrap", "q1_style_agg",
    "quality_classifier", "runs_test", "sampling_assign",
    "scd2_intervals", "semantic_edges", "seq3_support", "snapshot_diff",
    "sorted_neighborhood", "span_removal", "tfidf_knn",
    "tfidf_knn_relative_cap", "transitivity_capped", "unigram_nll",
    "unigram_segment", "vocab_top1000", "wilcoxon_midranks",
    "winnow_overlap", "wordpiece_segment", "zipf_fit",
})


def test_bench_local_carries_stability_fields():
    """r9 verdict #4 made the longitudinal bench signal part of the
    artifact: the committed BENCH_LOCAL.json must carry the median-of-3
    frozen-tier passes, the measured effective-cores gauge, and the
    q_stream_* micro-batch ledger (verdict #3) — and must have timed
    the battery without per-query errors. r12 verdict #2: the quiet-
    sentinel bar is now asserted, not just stamped — a contended
    capture (r12 shipped sentinel_pre 0.82-1.03) cannot be committed
    without failing this test."""
    import statistics

    d = json.load(open(os.path.join(ROOT, "BENCH_LOCAL.json")))
    assert len(d["core_runs"]) == 3
    assert d["core_total_median"] == sorted(d["core_runs"])[1]
    assert statistics.median(d["core_runs"]) == d["core_total_median"]
    assert d["effective_cores"] > 1.0
    sm = d["stream_metrics"]
    assert "q_stream_interval_join" in sm
    for v in sm.values():
        assert v["n_batches"] >= 1 and v["input_rows"] > 0
    assert not d.get("errors"), f"bench recorded errors: {d.get('errors')}"
    assert d["sentinel_pre"] <= _SENTINEL_PRE_MAX, (
        f"BENCH_LOCAL.json was captured contended (sentinel_pre "
        f"{d['sentinel_pre']} > {_SENTINEL_PRE_MAX}) — re-run bench.py "
        "on a quiet box before committing"
    )
    assert d["sentinel_post"] <= _SENTINEL_POST_MAX, (
        f"BENCH_LOCAL.json capture ended contended (sentinel_post "
        f"{d['sentinel_post']} > {_SENTINEL_POST_MAX}) — re-run bench.py "
        "on a quiet box before committing"
    )
    # contention mid-battery shows as one inflated core pass even with
    # quiet endpoint sentinels (memory: 37/47/39 vs 35/34/35) — require
    # a tight spread around the median
    med = d["core_total_median"]
    assert max(d["core_runs"]) <= 1.25 * med, (
        f"core_runs spread too wide ({d['core_runs']}): one inflated "
        "pass means mid-battery contention — discard and re-capture"
    )
    # round 13: the artifact must also carry the SHUFFLE sentinel pair
    # (the I/O contention mode the CPU sentinel is blind to — observed
    # this round: CPU sentinel FASTER than baseline, shuffle-heavy
    # lines ~1.15× inflated). No bound yet: the first committed capture
    # IS the baseline; bound it once a quiet history exists.
    assert d.get("shuffle_sentinel_pre") is not None
    assert d.get("shuffle_sentinel_post") is not None


def test_scale_probe_entries_carry_quiet_sentinels():
    """r12 verdict #2, second half: every SCALE_PROBE entry NOT in the
    explicit legacy grandfather list must carry sentinel_pre/post
    stamps at or under the quiet bar — the four round-12 probes shipped
    at sentinel_pre 1.03 because nothing mechanical rejected them."""
    d = json.load(open(os.path.join(ROOT, "SCALE_PROBE.json")))
    bad = []
    for name, e in d["probes"].items():
        if name in _LEGACY_PROBES:
            continue
        pre, post = e.get("sentinel_pre"), e.get("sentinel_post")
        if pre is None or post is None:
            bad.append(f"{name}: missing sentinel stamps")
        elif pre > _SENTINEL_PRE_MAX or post > _SENTINEL_POST_MAX:
            bad.append(f"{name}: contended capture (pre={pre}, post={post})")
    assert not bad, (
        "SCALE_PROBE entries violating the quiet-sentinel bar "
        f"(re-run tools/scale_probe.py on an idle box): {bad}"
    )


def test_changed_and_backlog_name_real_entries(registry):
    specs, changed, never = registry
    gated = {n for n, s in specs.items() if s.gate}
    assert not set(changed) - set(specs), "changed list names unknown queries"
    assert not set(never) - gated, (
        "never-sampled backlog must name gated registry entries only"
    )
    assert not set(changed) & set(never), (
        "a query in _CHANGED_THIS_ROUND must be dropped from the backlog"
    )


def test_no_orphan_public_operators():
    """Every PUBLIC function in operators/ must be referenced somewhere
    outside its own definition — a gated query, a test, streaming,
    tools, bench, or another operator. The r8 verdict caught
    ``eccentricity`` shipped with zero verification surface, and a
    round-10 audit found ``brown_forsythe`` (round 7) in the same
    state plus one dead helper; this makes that audit mechanical so an
    operator can't merge without a consumer."""
    import ast

    ops_dir = os.path.join(ROOT, "ups_crossref_etl_spark", "operators")
    public: dict[str, str] = {}
    module_text: dict[str, str] = {}
    #: per public function: occurrences of its own name inside its own
    #: def statement (the name itself) + its docstring — excluded from
    #: the same-module reference count, else a function whose docstring
    #: mentions itself passes the orphan check with zero real consumers
    #: (ADVICE r10)
    self_refs: dict[str, int] = {}
    for fname in os.listdir(ops_dir):
        if not fname.endswith(".py") or fname == "__init__.py":
            continue
        text = open(os.path.join(ops_dir, fname)).read()
        module_text[fname] = text
        for node in ast.parse(text).body:
            if isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
                public[node.name] = fname
                doc = ast.get_docstring(node) or ""
                self_refs[node.name] = 1 + len(
                    re.findall(rf"\b{re.escape(node.name)}\b", doc)
                )

    hay_parts = []
    for rel in [
        "ups_crossref_etl_spark/plans",
        "ups_crossref_etl_spark/streaming",
        "ups_crossref_etl_spark/functions",
        "ups_crossref_etl_spark/sources",
        "ups_crossref_etl_spark/engine.py",
        "ups_crossref_etl_spark/fixtures.py",
        "tests",
        "tools",
        "bench.py",
        "__spark_entry__.py",
    ]:
        path = os.path.join(ROOT, rel)
        if os.path.isfile(path):
            hay_parts.append(open(path).read())
        elif os.path.isdir(path):
            for dirpath, _, fnames in os.walk(path):
                for fn in fnames:
                    if fn.endswith(".py"):
                        hay_parts.append(
                            open(os.path.join(dirpath, fn)).read()
                        )
    hay = "\n".join(hay_parts)

    orphans = []
    for name, fname in sorted(public.items()):
        if re.search(rf"\b{re.escape(name)}\b", hay):
            continue
        # same-module or sibling-operator usage beyond the def itself
        # (the def statement + the function's own docstring are excluded
        # from its own module's count — ADVICE r10: a self-citing
        # docstring must not satisfy the orphan check)
        used = False
        for other, text in module_text.items():
            refs = len(re.findall(rf"\b{re.escape(name)}\b", text))
            if other == fname:
                refs -= self_refs.get(name, 1)
            if refs >= 1:
                used = True
                break
        if not used:
            orphans.append(f"{fname}:{name}")
    assert not orphans, (
        "public operators with no consumer anywhere (gate them with a "
        f"registry query + test, or remove them): {orphans}"
    )


def test_priority_tier_fits_driver_window():
    """The driver's correctness gate samples the FIRST ~50 registry
    entries (observed). The whole point of the changed-tier + backlog
    ordering is that every entry needing verification lands inside
    that window — so their combined size must stay <= 50, and load_all
    must actually emit them first. Registering one gated query too
    many would silently push a backlog entry out of the window."""
    from ups_crossref_etl_spark.plans.registry import (
        _CHANGED_THIS_ROUND,
        _NEVER_DRIVER_SAMPLED,
        load_all,
    )

    prio = list(_CHANGED_THIS_ROUND) + [
        n for n in _NEVER_DRIVER_SAMPLED if n not in _CHANGED_THIS_ROUND
    ]
    assert len(prio) <= 50, (
        f"changed tier + never-sampled backlog is {len(prio)} > 50: the "
        "driver window cannot re-verify everything — trim the changed "
        "list or defer new gated queries to next round"
    )
    head = list(load_all())[: len(prio)]
    assert set(prio) == set(head), (
        "load_all() must emit the changed tier + backlog first; "
        f"missing from head: {sorted(set(prio) - set(head))}"
    )


def test_driver_sample_staleness_bounded(registry):
    """r10 verdict #5: with the never-sampled backlog at zero, the
    remaining re-verification risk is ROTATION STALENESS — nothing
    guaranteed a gated query is re-sampled by the driver within any
    bounded number of rounds under the old pure-md5 rotation. load_all
    now orders the post-changed-tier entries least-recently-driver-
    sampled first (from the committed CORRECTNESS_r*.json artifacts),
    which bounds staleness by construction at ~ceil(N/slots) rounds;
    this test enforces the bound against the artifacts so a future
    ordering change (or a changed tier bloated enough to starve the
    rotation) fails loudly instead of silently rotting coverage."""
    from ups_crossref_etl_spark.plans.registry import (
        _ROUND,
        _last_sampled_rounds,
    )

    specs, _, _ = registry
    gated = [n for n, s in specs.items() if s.gate]
    # THE ROTATION MATH (r12 verdict #6), stated as a function of
    # registry size: the driver window holds W=50 slots; the changed
    # tier consumes |changed| of them (historical tiers ran 15-41, so
    # plan on S = W - 25 = 25 free rotation slots/round); LRS-first
    # ordering then guarantees every gated query is driver-re-sampled
    # at least every k_max = ceil(N / S) + 1 rounds. With N = len(gated)
    # this bound GROWS with the registry — the hard ceiling below makes
    # silent growth past the intended bound fail loudly instead of
    # quietly stretching staleness (FULLCHECK still re-verifies every
    # gate locally each round; this bound is specifically about the
    # driver's independent window).
    planning_slots = 25
    k_max = -(-len(gated) // planning_slots) + 1
    assert k_max <= 22, (
        f"registry grew to {len(gated)} gated queries: the 50-slot "
        f"driver window can no longer re-sample everything within "
        f"{k_max} <= 22 rounds at {planning_slots} rotation slots/round "
        "— trim the gate set, or revisit the window policy"
    )
    last = _last_sampled_rounds()
    window = set(list(specs)[:50])
    stale = sorted(
        (n, _ROUND - last.get(n, 0))
        for n in gated
        if n not in window and _ROUND - last.get(n, 0) > k_max
    )
    assert not stale, (
        f"gated queries whose most recent driver sample is older than "
        f"{k_max} rounds and which are NOT scheduled in this round's "
        f"window — the LRS rotation is being starved: {stale}"
    )


def test_fullcheck_postdates_last_gated_code_change():
    """r11 verdict #6: 'FULLCHECK must be refreshed AFTER the last
    gated-query code change' was enforced only by discipline plus the
    name-coverage test (which a code EDIT to an already-listed query
    slips past). Mechanical version: no commit AFTER the current
    round's FULLCHECK artifact commit may touch gated-path code. The
    artifact may land in the SAME commit as the last code change (the
    r10/r11 pattern) — `fc..HEAD` excludes the artifact commit itself.
    Mid-round this test is red until the final FULLCHECK refresh, the
    same lifecycle as test_fullcheck_current_round_covers_gated_registry.
    """
    import subprocess

    from ups_crossref_etl_spark.plans.registry import _ROUND

    artifact = f"FULLCHECK_r{_ROUND:02d}.json"

    def git(*args: str) -> str:
        try:
            return subprocess.run(
                ["git", *args], cwd=ROOT, capture_output=True,
                text=True, timeout=60, check=True,
            ).stdout.strip()
        except (OSError, subprocess.SubprocessError):
            pytest.skip("git history unavailable")

    fc_commit = git("log", "-1", "--format=%H", "--", artifact)
    assert fc_commit, (
        f"{artifact} has never been committed — run "
        f"tools/check_queries.py <sf_dir> --json {artifact} after the "
        "round's last gated-path change"
    )
    gated_paths = [
        "ups_crossref_etl_spark/plans",
        "ups_crossref_etl_spark/operators",
        "ups_crossref_etl_spark/functions",
        "ups_crossref_etl_spark/sources",
        "ups_crossref_etl_spark/streaming",
        "ups_crossref_etl_spark/schemas.py",
        "__spark_entry__.py",
    ]
    drift = git(
        "log", "--format=%h %s", f"{fc_commit}..HEAD", "--", *gated_paths
    )
    assert not drift, (
        f"gated-path code changed AFTER the {artifact} commit "
        f"({fc_commit[:9]}) — the full battery must be re-run and the "
        f"artifact recommitted. Offending commits:\n{drift}"
    )
