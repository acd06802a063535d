"""Text/dedup operators: semantic properties + python oracles."""

import hashlib

import pytest
from pyspark.sql import functions as F

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return T.corpus(spark, SF).cache()


def test_corpus_has_planted_dups(spark, corpus):
    base = corpus.filter(F.col("cid") < 1_000_000_000_000).count()
    dups = corpus.filter((F.col("cid") >= 1_000_000_000_000) & (F.col("cid") < 2_000_000_000_000)).count()
    near = corpus.filter(F.col("cid") >= 2_000_000_000_000).count()
    assert dups > 0 and near > 0 and base > dups


def test_exact_dedup_finds_planted_dups(spark, corpus):
    out = T.exact_dedup(corpus)
    dup_rows = out.filter("is_dup").collect()
    # every planted exact dup (cid = orig + 1_000_000_000_000) is flagged, canonical = orig
    for r in dup_rows:
        assert r["cid"] >= 1_000_000_000_000
        assert r["canonical_cid"] == r["cid"] - 1_000_000_000_000 or r["group_size"] >= 2
    planted = corpus.filter((F.col("cid") >= 1_000_000_000_000) & (F.col("cid") < 2_000_000_000_000)).count()
    assert len(dup_rows) == planted


def test_phash60_matches_md5_prefix(spark):
    df = spark.createDataFrame([("hello",), ("wörld",)], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", T.phash60(F.col("s")).alias("h")).collect()}
    for s, h in got.items():
        exp = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        assert h == exp, s


def test_minhash_exact_dups_have_identical_signatures(spark, corpus):
    sig = T.minhash_signature(corpus)
    a = sig.filter(F.col("cid") % 5 == 0).filter(F.col("cid") < 1_000_000_000_000)
    b = sig.filter(F.col("cid") >= 1_000_000_000_000).select(
        (F.col("cid") - 1_000_000_000_000).alias("cid"),
        *[F.col(f"mh_{i}").alias(f"dup_mh_{i}") for i in range(T.N_MINHASH)],
    )
    joined = a.join(b, "cid").collect()
    assert len(joined) > 0
    for r in joined:
        for i in range(T.N_MINHASH):
            assert r[f"mh_{i}"] == r[f"dup_mh_{i}"]


def test_lsh_pairs_contain_exact_dups_and_jaccard_confirms(spark, corpus):
    sig = T.minhash_signature(corpus)
    pairs = T.lsh_candidate_pairs(sig)
    got = {(r["cid_a"], r["cid_b"]) for r in pairs.collect()}
    exact = {
        (r["cid"], r["cid"] + 1_000_000_000_000)
        for r in corpus.filter(
            (F.col("cid") % 5 == 0) & (F.col("cid") < 1_000_000_000_000)
        ).select("cid").collect()
        if (r["cid"] + 1_000_000_000_000, ) is not None
    }
    exact = {p for p in exact if p[1] in {x["cid"] for x in corpus.select("cid").collect()}}
    assert exact <= got, f"missing {list(exact - got)[:5]}"
    jac = T.ngram_jaccard_pairs(corpus, pairs)
    rows = jac.collect()
    # exact dups -> jaccard 1.0; near dups -> high jaccard
    by_pair = {(r["cid_a"], r["cid_b"]): r["jaccard"] for r in rows}
    for p in exact:
        assert by_pair[p] == 1.0
    near = [v for (a, b), v in by_pair.items() if b >= 2_000_000_000_000 and a == b - 2_000_000_000_000]
    assert near and min(near) > 0.7


def test_simhash_dups_equal_near_dups_close(spark, corpus):
    sh = T.simhash32(corpus)
    rows = {r["cid"]: r["simhash"] for r in sh.collect()}
    for cid, v in rows.items():
        if 1_000_000_000_000 <= cid < 2_000_000_000_000:
            assert rows[cid - 1_000_000_000_000] == v  # exact dup -> same simhash
    hams = [
        bin(rows[cid - 2_000_000_000_000] ^ v).count("1")
        for cid, v in rows.items()
        if cid >= 2_000_000_000_000
    ]
    assert hams and max(hams) <= 12  # near dup -> small hamming distance
    assert sorted(hams)[len(hams) // 2] <= 6  # typical pair is very close


def test_text_stats_python_oracle(spark, corpus):
    sample = corpus.filter(F.col("cid") < 10)
    stats = {r["cid"]: r for r in T.text_stats(sample).collect()}
    for r in sample.collect():
        toks = r["text"].split(" ")
        s = stats[r["cid"]]
        assert s["n_tokens"] == len(toks)
        assert s["n_distinct_tokens"] == len(dict.fromkeys(toks))
        assert s["avg_token_len"] == pytest.approx(
            sum(map(len, toks)) / len(toks)
        )
        assert s["stopword_ratio"] == pytest.approx(
            sum(t in T.STOPWORDS for t in toks) / len(toks)
        )


def test_fingerprint_stable_and_dup_equal(spark, corpus):
    fp = {r["cid"]: r["fingerprint"] for r in T.fingerprint(corpus).collect()}
    for cid, v in fp.items():
        if 1_000_000_000_000 <= cid < 2_000_000_000_000:
            assert fp[cid - 1_000_000_000_000] == v


def test_lang_id_discriminates_real_text(spark):
    """The n-gram profiles must actually separate real multilingual prose
    (the synthetic corpus is English-ish token soup, so discrimination is
    pinned here, on genuine snippets)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    samples = [
        (1, "the quick brown fox is jumping over the lazy dog and the cat", "en"),
        (2, "ich gehe morgen mit der schwester und der mutter einkaufen schön", "de"),
        (3, "nous avons que les enfants mangent est bien dans les jardins", "fr"),
        (4, "la canción de los niños que cantan ha ganado los premios", "es"),
        (5, "今天天气很好我们一起去公园散步吧", "zh"),
        (6, "zzz qqq xxx", "und"),
    ]
    df = spark.createDataFrame(
        [(cid, txt) for cid, txt, _ in samples], "cid long, text string"
    )
    got = {r["cid"]: r["lang_pred"] for r in T.lang_id(df).collect()}
    for cid, _, want in samples:
        assert got[cid] == want, (cid, got[cid], want)
