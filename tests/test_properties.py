"""Property-based invariants (SURVEY.md §5.2 item 4) over random graphs.

The oracle is cheap (pure Python), so hypothesis drives it across many
random (seed, shape, size) combinations; the engine==oracle equality is
established separately by the golden tests, making these invariants
engine invariants too.
"""

from collections import Counter

from hypothesis import given, settings, strategies as st

from grawler import oracle, synthgen
from grawler.conf import CrawlConfig

CFG = CrawlConfig()
SHAPES = ["mixed", "bfs-tree", "diamond", "hot-host", "deep-chain",
          "robots-walled"]


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    shape=st.sampled_from(SHAPES),
    n_pages=st.integers(30, 150),
)
def test_crawl_invariants(seed, shape, n_pages):
    web = synthgen.generate(seed=seed, n_pages=n_pages, shape=shape)
    res = oracle.crawl(web, CFG, max_waves=6)

    # 1. every stored image was referenced by some seen page
    seen_urls = set(res.seen)
    referenced = set()
    for r in web.pages.to_dict("records"):
        if r["url"] in seen_urls:
            referenced.update(r["image_ids"])
    assert set(res.store) <= referenced

    # 2. politeness: no host exceeds its token budget in any wave
    per = Counter((w, h) for (w, _, _, h, _) in res.trace)
    assert all(v <= CFG.host_tokens_per_wave for v in per.values())

    # 3. frontier at end contains no seen urls
    assert not ({r["url"] for r in res.frontier} & seen_urls)

    # 4. no (url, wave) scheduled twice, and nothing is scheduled after
    #    the wave where it succeeded (fail-then-retry may schedule a url
    #    in several waves, success is terminal)
    uw = [(u, w) for (w, _, u, _, _) in res.trace]
    assert len(uw) == len(set(uw))
    for (w, _, u, _, _) in res.trace:
        if u in res.seen:
            assert w <= res.seen[u]

    # 5. seq dense and 0-based within each wave
    by_wave = {}
    for (w, s, *_rest) in res.trace:
        by_wave.setdefault(w, []).append(s)
    for w, seqs in by_wave.items():
        assert sorted(seqs) == list(range(len(seqs)))

    # 6. seen waves consistent with trace
    traced = {(u, w) for (w, _, u, _, _) in res.trace}
    for u, w in res.seen.items():
        assert (u, w) in traced


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_generator_deterministic(seed):
    a = synthgen.generate(seed=seed, n_pages=50, shape="mixed")
    b = synthgen.generate(seed=seed, n_pages=50, shape="mixed")
    assert a.pages.equals(b.pages)
    assert a.images.equals(b.images)
    assert list(a.seeds["url"]) == list(b.seeds["url"])


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10_000), compact_every=st.sampled_from([2, 3, 100]))
def test_merge_table_resolution_matches_dict_replay(seed, compact_every):
    """Random add/remove delta sequences: LocalSnapshotStore's merge-table
    read must equal a python dict replay at every wave, for any compaction
    cadence (same-wave add beats remove, latest wave wins)."""
    import random

    import pyspark.sql.functions as F

    from grawler.session import get_spark
    from grawler.store import LocalSnapshotStore
    import tempfile

    spark = get_spark("props", master="local[4]", shuffle_partitions=4)
    rng = random.Random(seed)
    keys = [f"k{i}" for i in range(12)]
    with tempfile.TemporaryDirectory() as tmp:
        st_ = LocalSnapshotStore(spark, tmp, compact_every=compact_every)
        model: dict = {}
        history = []
        for wave in range(5):
            adds = rng.sample(keys, rng.randint(0, 4))
            removes = rng.sample(keys, rng.randint(0, 4))
            rows = (
                [(k, wave, "add") for k in adds]
                + [(k, None, "remove") for k in removes]
            )
            rng.shuffle(rows)
            delta = spark.createDataFrame(
                rows, "url string, wave int, _op string")
            st_.commit_wave(wave, {"frontier": delta})
            # dict replay: removes apply first, same-wave add wins
            for k in removes:
                model.pop(k, None)
            for k in adds:
                model[k] = wave
            history.append(dict(model))
            got = {
                r["url"]: r["wave"]
                for r in st_.read("frontier").collect()
            }
            assert got == model, (wave, adds, removes)
        # upto_wave replay across whatever compactions happened
        for w, want in enumerate(history):
            got = {r["url"]: r["wave"]
                   for r in st_.read("frontier", upto_wave=w).collect()}
            assert got == want, w


@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_seen=st.integers(0, 400),
    n_probe=st.integers(0, 120),
    nb=st.sampled_from([1, 2, 8, 16]),
    budget=st.sampled_from([0, 10_000]),  # pruned-shuffle vs broadcast path
)
def test_bucketed_probe_equals_set_difference(spark, tmp_path_factory,
                                              seed, n_seen, n_probe, nb,
                                              budget):
    """exactcheck.bucketed_anti_join == plain set difference for random
    overlapping url sets, on both execution paths, at any bucket count —
    including empty seen and empty probe."""
    import random

    from grawler.exactcheck import bucketed_anti_join
    from grawler.store import LocalSnapshotStore

    rng = random.Random(seed)
    universe = [f"http://h{i % 13}.example/p{i}" for i in range(600)]
    seen = rng.sample(universe, n_seen)
    probe = rng.sample(universe, n_probe)
    tmp = tmp_path_factory.mktemp("bprobe")
    st_ = LocalSnapshotStore(spark, str(tmp), initial_buckets=nb)
    st_.commit_wave(0, {"seen": spark.createDataFrame(
        [(u,) for u in seen] or [], "url string")})
    rb = st_.read_bucketed("seen")
    pdf = spark.createDataFrame([(u,) for u in probe] or [], "url string")
    if rb is None:  # empty seen commits an empty delta: nothing to probe
        assert n_seen == 0
        return
    got = sorted(r["url"] for r in bucketed_anti_join(
        pdf, rb[0], rb[1], "url", broadcast_max_rows=budget).collect())
    assert got == sorted(set(probe) - set(seen))
