"""Quadratic-candidate guards on the exact/demo dedup forms (r9).

The scale-killer failure mode of the inverted-index Jaccard join and
the fixed-bits LSH bucket join is a silent quadratic candidate blowup
(measured: heap exhaustion at sf10 on a replicated corpus). Both
operators now probe the exact candidate count — Σ m·(m−1)/2 over the
ACTUAL join input — with one linear aggregate and refuse, naming the
measured mass and the scale-safe alternative, instead of attempting
the join. Same pattern as with_fill's axis guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adguard2clickhouse_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def boiler_docs(spark):
    """12 docs sharing one boilerplate 3-shingle ('terms of service')
    plus unique tails — the shared shingle alone contributes
    12·11/2 = 66 candidate pairs."""
    rows = [
        (i, f"terms of service unique{i} tail{i} word{i}") for i in range(12)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_jaccard_guard_trips_with_named_mass_and_fixes(boiler_docs):
    with pytest.raises(ValueError) as e:
        dedup.ngram_jaccard_pairs(boiler_docs, n=3, max_candidate_pairs=10)
    msg = str(e.value)
    assert "66" in msg  # the measured mass, not a guess
    assert "max_df_ratio" in msg and "minhash_lsh_pairs" in msg


def test_jaccard_guard_probes_post_cap_input(boiler_docs):
    """The probe measures the join the caller actually runs: with the
    boilerplate shingle df-capped out of the join, the same corpus
    passes the same tiny cap."""
    out = dedup.ngram_jaccard_pairs(
        boiler_docs, n=3, max_df=2, max_candidate_pairs=10
    )
    assert out.count() == 0  # unique tails: nothing left to pair


def test_jaccard_default_cap_and_disable_unchanged(boiler_docs):
    expected = dedup.ngram_jaccard_pairs(
        boiler_docs, n=3, threshold=0.3, max_candidate_pairs=None
    ).collect()
    got = dedup.ngram_jaccard_pairs(boiler_docs, n=3, threshold=0.3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


@pytest.fixture(scope="module")
def clone_vecs(spark):
    """10 identical vectors — every LSH table puts all of them in one
    bucket: 4 tables x 10·9/2 = 180 candidates before pair-dedup."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(10)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_lsh_guard_trips_on_clone_bucket(clone_vecs):
    with pytest.raises(ValueError) as e:
        similarity.embedding_dup_pairs_lsh(
            clone_vecs, dim=4, max_candidate_pairs=100
        )
    msg = str(e.value)
    assert "180" in msg
    assert "max_bucket" in msg and "bits" in msg


def test_lsh_guard_probes_post_bucket_cap(clone_vecs):
    """max_bucket drops the clone bucket from the join; the guard sees
    the join that will actually run and lets it through."""
    out = similarity.embedding_dup_pairs_lsh(
        clone_vecs, dim=4, max_bucket=5, max_candidate_pairs=100
    )
    assert out.count() == 0


def test_lsh_default_cap_passes_fixture(clone_vecs):
    pairs = similarity.embedding_dup_pairs_lsh(clone_vecs, dim=4).count()
    assert pairs == 45  # all identical vectors pair up


# ---------------------------------------------------------------------------
# on_overflow="reroute" (r10): opt-in dispatch to the measured scale twin
# instead of the sized refusal (VERDICT r9 ask #2)
# ---------------------------------------------------------------------------


def test_jaccard_reroute_parity_with_exact(boiler_docs):
    """A guard-tripping call with on_overflow='reroute' dispatches to
    the PPJoin twin and returns BIT-IDENTICAL rows to the uncapped
    exact index form."""
    exact = dedup.ngram_jaccard_pairs(
        boiler_docs, n=3, threshold=0.1, max_candidate_pairs=None
    ).collect()
    assert len(exact) == 66  # every pair shares the boilerplate shingle
    rerouted = dedup.ngram_jaccard_pairs(
        boiler_docs, n=3, threshold=0.1,
        max_candidate_pairs=10, on_overflow="reroute",
    ).collect()
    assert sorted(map(tuple, rerouted)) == sorted(map(tuple, exact))


def test_jaccard_reroute_capped_overflow_still_raises(spark):
    """With a df cap set the caller already chose a scale strategy; a
    still-overflowing capped mass must raise (PPJoin can't honor df
    caps, and silently dropping them would run a BIGGER join)."""
    rows = [
        (2 * i + j, f"alpha{i} beta{i} gamma{i} delta{i} eps{i}")
        for i in range(4)
        for j in range(2)
    ]  # 4 clone-pairs; every shingle has df=2
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    with pytest.raises(ValueError, match="candidate pairs"):
        dedup.ngram_jaccard_pairs(
            docs, n=3, max_df=3, max_candidate_pairs=1,
            on_overflow="reroute",
        )


def test_jaccard_on_overflow_validated(boiler_docs):
    with pytest.raises(ValueError, match="on_overflow"):
        dedup.ngram_jaccard_pairs(boiler_docs, on_overflow="retry")


@pytest.fixture()
def boiler_plus_dups_docs(spark):
    """12 docs all sharing one boilerplate 3-shingle (drives the guard
    mass: 66 pairs) PLUS 6 true near-dup twin pairs sharing low-df
    content shingles — the corpus where the boilerplate cap keeps the
    real signal while shedding the quadratic term."""
    rows = [
        (i, f"terms of service pair{i // 2} content{i // 2} "
            f"words{i // 2} tail{i}")
        for i in range(12)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_jaccard_reroute_capped_dispatches_to_ratio_cap(boiler_plus_dups_docs):
    """on_overflow='reroute_capped' is the WALL-BUDGET tier (VERDICT
    r12 #1): above the cap the edges come from the df-ratio-capped
    index — identical rows to a direct max_df_ratio call — instead of
    the exact PPJoin twin (685 s at sf10 for the registered closure).
    True near-dup pairs survive; only boilerplate-evidence-only pairs
    drop."""
    direct_capped = dedup.ngram_jaccard_pairs(
        boiler_plus_dups_docs, n=3, threshold=0.1, max_df_ratio=0.25
    ).collect()
    assert len(direct_capped) == 6  # the true twins, never the 66
    rerouted = dedup.ngram_jaccard_pairs(
        boiler_plus_dups_docs, n=3, threshold=0.1,
        max_candidate_pairs=20, on_overflow="reroute_capped",
        reroute_df_ratio=0.25,
    ).collect()
    assert sorted(map(tuple, rerouted)) == sorted(map(tuple, direct_capped))


def test_jaccard_reroute_capped_engagement_is_announced(
    boiler_plus_dups_docs, capsys
):
    """ADVICE r13 (medium): when the capped tier actually ENGAGES the
    caller gets a one-line stderr notice carrying the cap, the
    measured/bounded mass and the lossiness caveat — consumers of the
    registered queries can now tell exact from approximate output at
    runtime. Below the cap (exact output) it stays silent."""
    dedup.ngram_jaccard_pairs(
        boiler_plus_dups_docs, n=3, threshold=0.1,
        max_candidate_pairs=20, on_overflow="reroute_capped",
        reroute_df_ratio=0.25,
    ).collect()
    err = capsys.readouterr().err
    assert "REROUTE-CAPPED ENGAGED" in err
    assert "max_candidate_pairs=20" in err
    assert "may drop" in err
    # exact path: no notice
    dedup.ngram_jaccard_pairs(
        boiler_plus_dups_docs, n=3, threshold=0.1,
        max_candidate_pairs=1000, on_overflow="reroute_capped",
    ).collect()
    assert "REROUTE-CAPPED" not in capsys.readouterr().err


def test_jaccard_reroute_capped_below_cap_stays_exact(boiler_plus_dups_docs):
    """Below the cap reroute_capped changes NOTHING: same exact plan,
    same rows as the unguarded index form — the gate SFs sit here."""
    exact = dedup.ngram_jaccard_pairs(
        boiler_plus_dups_docs, n=3, threshold=0.1, max_candidate_pairs=None
    ).collect()
    assert len(exact) == 66  # every pair shares the boilerplate shingle
    guarded = dedup.ngram_jaccard_pairs(
        boiler_plus_dups_docs, n=3, threshold=0.1,
        max_candidate_pairs=1000, on_overflow="reroute_capped",
    ).collect()
    assert sorted(map(tuple, guarded)) == sorted(map(tuple, exact))


def test_jaccard_reroute_capped_still_raises_when_capped_mass_over(
    boiler_plus_dups_docs,
):
    """A corpus whose CAPPED mass still tops the cap needs the banded
    MinHash path — reroute_capped must refuse with the sized message,
    never silently attempt the join or re-reroute."""
    with pytest.raises(ValueError, match="candidate pairs"):
        dedup.ngram_jaccard_pairs(
            boiler_plus_dups_docs, n=3, threshold=0.1,
            max_candidate_pairs=5, on_overflow="reroute_capped",
            reroute_df_ratio=0.25,
        )


@pytest.fixture(scope="module")
def mixed_vecs(spark):
    """100 seeded-random dim-8 vectors plus 3 exact clone pairs. At
    bits=2 / n_tables=2 the 4 buckets per table hold ~25 vectors each
    (mass ≈ 2·4·300 ≈ 2400); at the rerouted bits the buckets thin out
    while the clone pairs still collide in every table (p→1 as
    cos→1)."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(100)
    ]
    for k in range(3):
        v = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((100 + 2 * k, list(v)))
        rows.append((101 + 2 * k, list(v)))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_lsh_reroute_scales_bits_and_matches_exact(mixed_vecs):
    """Guard trips at bits=2; reroute re-runs at the auto-scaled bits
    with max_bucket=256 and succeeds. Every reported pair passes the
    exact cosine verify (precision 1 vs the exact form) and the true
    clone pairs — the pairs a dedup run exists to find — survive."""
    rerouted = similarity.embedding_dup_pairs_lsh(
        mixed_vecs, threshold=0.999, bits=2, n_tables=2, dim=8,
        max_candidate_pairs=1000, on_overflow="reroute",
    ).collect()
    got = {(r.id_a, r.id_b) for r in rerouted}
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_dup_pairs(
            mixed_vecs, threshold=0.999
        ).collect()
    }
    assert got <= exact  # precision 1: subset of the exact result
    assert {(100, 101), (102, 103), (104, 105)} <= got


def test_lsh_reroute_raises_when_already_rerouted_form(clone_vecs):
    """If the caller's parameters already ARE the rerouted form there
    is nothing left to scale: the guard raises even under reroute."""
    with pytest.raises(ValueError, match="candidate pairs"):
        similarity.embedding_dup_pairs_lsh(
            clone_vecs, dim=4, bits=16, max_bucket=256,
            max_candidate_pairs=10, on_overflow="reroute",
        )


def test_lsh_on_overflow_validated(clone_vecs):
    with pytest.raises(ValueError, match="on_overflow"):
        similarity.embedding_dup_pairs_lsh(
            clone_vecs, dim=4, on_overflow="maybe"
        )


def test_lsh_capped_bound_skips_probe(clone_vecs, spark):
    """ADVICE r9: with max_bucket set the tight stage-1 bound is
    n_tables·n·(max_bucket−1)/2 — linear — so a capped call on a
    modest corpus must not pay the stage-2 shuffle probe. Observable
    contract: the capped call with a cap ABOVE the tight bound
    (4·10·4/2 = 80 ≤ 100) runs no probe and succeeds even though the
    loose bound (4·10·9/2 = 180) would have forced one."""
    out = similarity.embedding_dup_pairs_lsh(
        clone_vecs, dim=4, max_bucket=5, max_candidate_pairs=100
    )
    assert out.count() == 0


def test_jaccard_fast_dispatch_above_crossover_is_exact(spark):
    """The r10 fast path: a reroute-enabled call on a corpus whose
    posting mass sits above the PPJoin crossover dispatches BEFORE the
    shingle cache/probe. Its answers must still be bit-identical to
    the uncapped exact index form."""
    import random

    rng = random.Random(11)
    rows = []
    for d in range(8000):  # 8000 docs x 100 tokens = 800k postings
        toks = [f"w{d}_{i}" for i in range(100)]
        rows.append((d, " ".join(toks)))
    for k in range(5):  # five exact clone pairs so the answer is non-empty
        src_text = rows[rng.randrange(8000)][1]
        rows.append((9000 + 2 * k, src_text))
        rows.append((9001 + 2 * k, src_text))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    from adguard2clickhouse_spark.operators.dedup import (
        PPJOIN_POSTING_MASS_CROSSOVER,
        choose_jaccard_strategy,
    )

    strat, stats = choose_jaccard_strategy(docs)
    assert stats["posting_mass"] >= PPJOIN_POSTING_MASS_CROSSOVER
    assert strat == "ppjoin"  # the fast path's precondition holds

    rerouted = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.8, max_candidate_pairs=1,
        on_overflow="reroute",
    ).collect()
    exact = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.8, max_candidate_pairs=None
    ).collect()
    assert len(exact) >= 5
    assert sorted(map(tuple, rerouted)) == sorted(map(tuple, exact))


def test_auto_reroute_measures_posting_mass_once(boiler_docs, monkeypatch):
    """ADVICE r10 low: strategy='auto' + on_overflow='reroute' used to
    run choose_jaccard_strategy twice (auto resolution, then the fast
    dispatch re-probing the same stats). The stats are measured at most
    once now; when auto resolves to 'index' the corpus is below the
    crossover and the fast dispatch could never fire anyway."""
    calls = {"n": 0}
    real = dedup.choose_jaccard_strategy

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(dedup, "choose_jaccard_strategy", counting)
    out = dedup.ngram_jaccard_pairs(
        boiler_docs, n=3, threshold=0.1, strategy="auto",
        max_candidate_pairs=None, on_overflow="reroute",
    ).collect()
    assert calls["n"] == 1
    assert len(out) == 66  # same answer as the exact form


def test_broadcast_policy_tiny_corpus_keeps_static_plans(spark):
    """A measurably-tiny corpus (posting bound under the session's
    static broadcast threshold) gets the null context — the conf is
    untouched inside, so the static planner keeps its broadcast plans
    (the measured ~0.8 s bench-SF saving vs the blanket conf)."""
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with dedup._broadcast_policy(spark, {"posting_mass": 1000, "n_docs": 10}):
        assert (
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
        )


def test_broadcast_policy_corpus_scaled_disables_static_broadcast(spark):
    """Corpus-scaled stats (the sf10 OOM class: Catalyst's per-type
    size defaults estimate every shingle frame as tiny, then the
    static planner broadcasts a 500k-doc array frame and dies in
    BroadcastExchange on a default 8 GB session) engage the runtime-
    only conf: static threshold -1 inside, the session's threshold
    moved to AQE's runtime knob, both restored on exit."""
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    big = {"posting_mass": 26_000_000, "n_docs": 500_000}  # ~630 MB bound
    with dedup._broadcast_policy(spark, big):
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
        assert (
            spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
            == before
        )
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before


def test_broadcast_policy_probed_mass_bounds_verify_join(spark):
    """When the guard's exact probe ran, the policy also bounds the
    verify join's array-carrying intermediate: a duplication-extreme
    SMALL corpus (tiny posting mass, huge exact pair mass) must engage
    the runtime-only conf even though the index bound alone passes."""
    stats = {"posting_mass": 100_000, "n_docs": 1_000}  # index ~2.4 MB: tiny
    with dedup._broadcast_policy(spark, stats, exact_mass=400_000):
        # 400k pairs x (101*8+32) B ~ 336 MB > 64 MB threshold
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"


def test_unguarded_jaccard_measures_stats_for_broadcast_policy(
    boiler_docs, monkeypatch
):
    """max_candidate_pairs=None callers skip the guard but still get a
    measured broadcast decision: the map-only stat is taken exactly
    once at materialization (never the blanket runtime-only conf, never
    zero measurements)."""
    calls = {"n": 0}
    real = dedup.choose_jaccard_strategy

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(dedup, "choose_jaccard_strategy", counting)
    out = dedup.ngram_jaccard_pairs(
        boiler_docs, n=3, threshold=0.1, max_candidate_pairs=None
    ).collect()
    assert calls["n"] == 1
    assert len(out) == 66


def test_simhash_candidate_guard_refuses_corpus_bomb(spark):
    """simhash_near_pairs was the last unguarded pair generator: the
    registered max_hamming=8 banding (9 bands x ~7 bits = 128 chunk
    values) turns a 500k-doc corpus into a 17.7e9-candidate join that
    executor-OOMs an 8 GB session (measured at sf10). The guard now
    probes the exact band-bucket mass and refuses, naming alternatives."""
    rows = [(i, "same text everywhere identical") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    with pytest.raises(ValueError, match="candidate pairs"):
        dedup.simhash_near_pairs(docs, max_hamming=3, max_candidate_pairs=100)


def test_simhash_mass_scaled_repartition_keeps_answers(spark):
    """Below the cap, the measured mass scales the band join's
    partition count (explicit numPartitions — the one thing AQE's
    input-size coalescing cannot undo; at sf10 847M candidates through
    AQE-coalesced partitions OOM'd, through mass/2M explicit partitions
    completed in 91 s). Forcing a tiny rows-per-task here makes the
    repartition path run at test size; answers must be identical to
    the unscaled plan."""
    rows = [  # 3 exact-duplicate families -> guaranteed hamming-0 pairs
        (i, f"family {i % 3} text body repeated tokens for the sketch")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    scaled = dedup.simhash_near_pairs(
        docs, max_hamming=3, candidate_rows_per_task=1
    ).collect()
    plain = dedup.simhash_near_pairs(
        docs, max_hamming=3, candidate_rows_per_task=0
    ).collect()
    assert sorted(map(tuple, scaled)) == sorted(map(tuple, plain))
    assert len(plain) > 0


def test_simhash_dominant_bucket_salting_keeps_answers(spark):
    """The hash repartition can't split ONE oversized (band, chunk)
    bucket — all its rows share the join key, so a corpus whose
    candidate mass is concentrated in a single dominant duplicate
    family still funnels into one task (ADVICE r12). When the probe
    measures a bucket whose own pair mass tops rows-per-task, the
    triangle is salted: a-side bucketed into g sub-groups, b-side
    replicated across them, _salt joined alongside the band keys.
    Answers must be identical to the unsalted plan — every ordered
    pair surfaces exactly once under the a-row's salt."""
    # ONE duplicate family: every doc identical -> a single dominant
    # bucket per band; 24 docs -> 276 pairs per bucket >> rpt=5.
    rows = [(i, "identical corpus boilerplate body text") for i in range(24)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    salted = dedup.simhash_near_pairs(
        docs, max_hamming=3, candidate_rows_per_task=5
    ).collect()
    plain = dedup.simhash_near_pairs(
        docs, max_hamming=3, candidate_rows_per_task=0
    ).collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))
    assert len(plain) == 24 * 23 // 2  # all-pairs at hamming 0


def test_ppjoin_direct_guard_refuses_prefix_bomb(boiler_docs):
    """The PPJoin twin was the last pair generator without its own
    guard — a DIRECT call on a corpus whose prefix-filtered mass is
    still a bomb ran a silent multi-hour join (r13). At t=0.1 prefixes
    are ~90% of each doc, so the boiler corpus's 66-pair mass survives
    prefix filtering and must trip a tiny cap with the sized message."""
    with pytest.raises(ValueError, match="PREFIX-filtered"):
        dedup.ngram_jaccard_pairs_ppjoin(
            boiler_docs, n=3, threshold=0.1, max_candidate_pairs=10
        )


def test_ppjoin_guard_parity_below_cap(boiler_docs):
    """Below the cap the guard costs one map-only bound check at most
    and answers stay bit-identical to the unguarded twin."""
    guarded = dedup.ngram_jaccard_pairs_ppjoin(
        boiler_docs, n=3, threshold=0.1
    ).collect()
    unguarded = dedup.ngram_jaccard_pairs_ppjoin(
        boiler_docs, n=3, threshold=0.1, max_candidate_pairs=None
    ).collect()
    assert sorted(map(tuple, guarded)) == sorted(map(tuple, unguarded))
    assert len(guarded) == 66


def test_reroute_to_ppjoin_is_not_guarded(boiler_docs):
    """on_overflow='reroute' is the documented exactness-at-any-wall
    tier: the overflow dispatch must arrive at the twin with the guard
    DISABLED, so a caller's tiny cap (which the exact form just
    overflowed) cannot turn the completion path into a second refusal.
    This pins the r10 contract the new direct-call guard must not
    break."""
    rerouted = dedup.ngram_jaccard_pairs(
        boiler_docs, n=3, threshold=0.1,
        max_candidate_pairs=10, on_overflow="reroute",
    ).collect()
    assert len(rerouted) == 66


def test_byte_conf_suffix_parsing():
    """_broadcast_policy's threshold parse must understand Spark's
    unit-suffixed byte strings ('64m', '10MB', '1g') — int() alone
    sent every suffixed session into the runtime-only conf and its
    ~0.8 s stage-boundary cost even for measurably tiny corpora
    (ADVICE r12)."""
    f = dedup._byte_conf_to_int
    assert f("67108864") == 64 * 1024 * 1024
    assert f("64m") == 64 * 1024 * 1024
    assert f("64MB") == 64 * 1024 * 1024
    assert f("10mb") == 10 * 1024 * 1024
    assert f("1g") == 1 << 30
    assert f("1GB") == 1 << 30
    assert f("512k") == 512 * 1024
    assert f("2t") == 2 << 40
    assert f("-1") == -1
    assert f(None) == -1
    assert f("nonsense") == -1
    assert f("") == -1


def test_edit_distance_guard_refuses_coarse_blocks(spark):
    """r14 (found by the sf100 sweep): edit_distance_pairs was the LAST
    pair generator off the scale-policy ladder — a low-cardinality
    blocking key turns the "confined" within-bucket join into ~n²/2
    pairs (900 s budget blown at sf100). The guard probes the ACTUAL
    bucket mass and refuses with the measured number + the in-family
    remedy."""
    rows = [(i, "src", f"title {i} common words here") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    with pytest.raises(ValueError, match="780 pairs"):  # 40*39/2, measured
        dedup.edit_distance_pairs(
            docs, "source", max_candidate_pairs=100
        )


def test_edit_distance_block_prefix_remedy_completes_and_keeps_dups(spark):
    """The refusal's named remedy: co-blocking on the text's first m
    chars sheds the quadratic mass while true near-dups (which agree
    on the prefix) still collide and surface with the same distance."""
    rows = [(i, "src", f"unique{i:03d} title body tail") for i in range(40)]
    # one true near-dup pair: same 20-char prefix, one edit at the tail
    rows += [(100, "src", "shared prefix here xx tail one"),
             (101, "src", "shared prefix here xx tail two")]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    # unguarded, no co-block: the pair is found (ground truth)
    want = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in dedup.edit_distance_pairs(
            docs, "source", max_candidate_pairs=None
        ).collect()
        if r.doc_a == 100
    }
    assert want, "fixture must contain a true near-dup pair"
    # guarded at a cap the coarse block overflows, WITH the remedy:
    # completes (mass sheds below the cap) and keeps the true pair
    got = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in dedup.edit_distance_pairs(
            docs, "source", block_prefix_len=20, max_candidate_pairs=100
        ).collect()
    }
    assert want <= got
    # below the cap, guard on: answers identical to unguarded
    full = {
        tuple(r)
        for r in dedup.edit_distance_pairs(
            docs, "source", max_candidate_pairs=10_000
        ).collect()
    }
    base = {
        tuple(r)
        for r in dedup.edit_distance_pairs(
            docs, "source", max_candidate_pairs=None
        ).collect()
    }
    assert full == base


def test_edit_distance_null_buckets_never_join_and_never_count(spark):
    """r15 (ADVICE r14): NULL-bucket rows are non-joinable in the plain
    path (NULL equality), and enabling block_prefix_len must not change
    that — concat_ws skips NULLs, so without the NULL propagation the
    co-block key collapsed NULL-bucket rows onto the bare text prefix
    and the remedy silently ADDED cross-bucket pairs. The mass probe
    likewise excludes NULL buckets: it must measure what the join
    actually emits, not refuse a corpus on pairs that never happen."""
    rows = [(i, None, "identical text body for everyone") for i in range(30)]
    rows += [(100, "src", "identical text body for everyone"),
             (101, "src", "identical text body for everyone")]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])

    # plain path: only the non-NULL bucket pair exists
    plain = {
        (r.doc_a, r.doc_b)
        for r in dedup.edit_distance_pairs(
            docs, "source", max_candidate_pairs=None
        ).collect()
    }
    assert plain == {(100, 101)}

    # co-blocked path: identical prefixes everywhere, but NULL buckets
    # still never match — same single pair
    blocked = {
        (r.doc_a, r.doc_b)
        for r in dedup.edit_distance_pairs(
            docs, "source", block_prefix_len=10, max_candidate_pairs=None
        ).collect()
    }
    assert blocked == {(100, 101)}

    # probe: 30 NULL rows would be 435 phantom pairs; real mass is 1.
    # A cap of 10 must ADMIT this corpus (and the join still completes).
    guarded = {
        (r.doc_a, r.doc_b)
        for r in dedup.edit_distance_pairs(
            docs, "source", max_candidate_pairs=10
        ).collect()
    }
    assert guarded == {(100, 101)}


def test_embedding_dup_guard_refuses_unsized_all_pairs(spark):
    """r15 (tranche-7 sf100 sweep find): embedding_dup_pairs was the
    last pair generator without a mass guard — the exact all-pairs
    self-join at 2M sf100 vectors is 2e12 dot products (blew the 900 s
    budget). The guard probes the non-zero-norm count and refuses with
    the measured mass + the in-family remedies; below the cap (and
    with the guard disabled) answers are identical."""
    from adguard2clickhouse_spark.operators import similarity

    rows = [(i, [float(i % 7) + 1.0] * 4) for i in range(60)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="1,770 pairs"):  # 60*59/2
        similarity.embedding_dup_pairs(emb, threshold=0.9,
                                       max_candidate_pairs=100)
    base = {
        tuple(r)
        for r in similarity.embedding_dup_pairs(
            emb, threshold=0.9, max_candidate_pairs=None
        ).collect()
    }
    guarded = {
        tuple(r)
        for r in similarity.embedding_dup_pairs(
            emb, threshold=0.9, max_candidate_pairs=10_000
        ).collect()
    }
    assert guarded == base and base


def test_embedding_lsh_portable_guard(spark):
    """r15 (policy uniformity, same sweep that guarded the exact
    baseline): the fixed-bits single-table LSH twin is quadratic by
    construction (bucket occupancy ∝ n at constant 2^bits) — the guard
    probes actual bucket sizes and refuses with the measured mass;
    below the cap the pair set is unchanged."""
    from adguard2clickhouse_spark.operators import similarity

    # all-identical vectors: one bucket of 40 -> 780 pairs, all verify
    emb = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0] * 16) for i in range(40)],
        ["vec_id", "embedding"],
    )
    with pytest.raises(ValueError, match="780 candidate pairs"):
        similarity.embedding_dup_pairs_lsh_portable(
            emb, threshold=0.9, max_candidate_pairs=100
        )
    base = {
        tuple(r)
        for r in similarity.embedding_dup_pairs_lsh_portable(
            emb, threshold=0.9, max_candidate_pairs=None
        ).collect()
    }
    guarded = {
        tuple(r)
        for r in similarity.embedding_dup_pairs_lsh_portable(
            emb, threshold=0.9, max_candidate_pairs=10_000
        ).collect()
    }
    assert guarded == base and len(base) == 780


# ---------------------------------------------------------------------------
# r16 first-kept-table fused verify (VERDICT r15 #1): the bucket join
# counts each pair once, at its first KEPT agreeing table, instead of
# verify-per-agreeing-table + dropDuplicates. These pin the rewrite to
# the r15 reference shape on corpora that exercise the edge the rule
# must get right: a pair whose FIRST agreeing table sits in a bucket
# the max_bucket cap dropped must still be found at a later kept one.
# ---------------------------------------------------------------------------


def _r15_reference_lsh(df, threshold, bits, n_tables, seed, dim, max_bucket):
    """The r15 shape spelled out independently: posexploded signatures,
    semi-join bucket cap, verify per agreeing table, dropDuplicates at
    the end. Written (r16) to prove the attempted first-kept-table
    rewrite emitted the identical multiset; kept after that rewrite was
    reverted on a negative sf100 A/B (see embedding_dup_pairs_lsh's
    docstring) as an output-multiset regression pin across cap shapes —
    any future restructure must keep these assertions green."""
    from adguard2clickhouse_spark.operators.similarity import (
        dot,
        lsh_signatures_udf,
        norm,
    )

    base = df.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").alias("_v"),
        norm(F.col("embedding")).alias("_n"),
    )
    sigs = base.select(
        "_id",
        "_v",
        "_n",
        F.posexplode(
            lsh_signatures_udf(dim, bits, n_tables, seed)(F.col("_v"))
        ).alias("_t", "_s"),
    )
    if max_bucket is not None:
        counts = sigs.groupBy("_t", "_s").agg(F.count(F.lit(1)).alias("_c"))
        small = counts.filter(F.col("_c") <= max_bucket)
        sigs = sigs.join(small.select("_t", "_s"), ["_t", "_s"], "left_semi")
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a._t") == F.col("b._t"))
            & (F.col("a._s") == F.col("b._s"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.try_divide(
                dot(F.col("a._v"), F.col("b._v")),
                F.col("a._n") * F.col("b._n"),
            ).alias("_sim"),
        )
        .filter(F.col("_sim") >= threshold)
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


@pytest.fixture(scope="module")
def lumpy_vecs(spark):
    """60 vectors in 3 noisy clusters + 10 exact clones: cluster pairs
    agree in SOME tables (first-agreeing-table varies per pair), the
    clone block agrees in EVERY table (so a tight max_bucket drops its
    buckets in all tables), and cross-cluster pairs agree in none."""
    import random

    rng = random.Random(7)
    rows = []
    centers = [[5.0, 0.0, 0.0, 1.0], [0.0, 5.0, 1.0, 0.0], [1.0, 0.0, 5.0, 3.0]]
    for i in range(60):
        c = centers[i % 3]
        rows.append(
            (i, [x + rng.uniform(-1.5, 1.5) for x in c])
        )
    rows += [(100 + i, [2.0, 2.0, 2.0, 2.0]) for i in range(10)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


@pytest.mark.parametrize(
    "bits,n_tables,max_bucket",
    [
        (2, 4, None),   # tiny sigs: heavy multi-table agreement, uncapped
        (2, 4, 8),      # tight cap: many dropped buckets incl. first tables
        (2, 4, 3),      # tighter: clone block fully dropped everywhere
        (4, 8, 16),     # the production-policy shape
    ],
)
def test_lsh_output_matches_reference_shape(
    lumpy_vecs, bits, n_tables, max_bucket
):
    new = similarity.embedding_dup_pairs_lsh(
        lumpy_vecs,
        threshold=0.35,
        bits=bits,
        n_tables=n_tables,
        seed=42,
        dim=4,
        max_bucket=max_bucket,
        max_candidate_pairs=None,
    )
    ref = _r15_reference_lsh(
        lumpy_vecs, 0.35, bits, n_tables, 42, 4, max_bucket
    )
    # Multiset identity both ways (also proves the new form emits each
    # pair exactly once — a duplicate would survive exceptAll against
    # the deduplicated reference).
    assert new.exceptAll(ref).count() == 0
    assert ref.exceptAll(new).count() == 0


def test_lsh_emits_each_pair_once(lumpy_vecs):
    out = similarity.embedding_dup_pairs_lsh(
        lumpy_vecs,
        threshold=0.35,
        bits=2,
        n_tables=8,
        seed=42,
        dim=4,
        max_candidate_pairs=None,
    ).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert len(pairs) == len(set(pairs))
