"""Similarity search over embedding columns (graft addition, first-class per
the build brief): brute-force cosine top-k baseline + LSH-bucketed scale
path.

Embeddings are ``array<float>`` rows; all distance math stays JVM-side via
higher-order functions (``aggregate``/``zip_with``) in float64 — no Python
in the hot path.  The LSH variant buckets by random-hyperplane sign bits
(hyperplanes derived deterministically from the dimension index, no RNG) and
only scores within-bucket ± multiprobe candidates; recall vs brute force is
pinned by tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_bruteforce_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_cols: tuple[str, str] = ("qid", "qvec"),
    c_cols: tuple[str, str] = ("vec_id", "embedding"),
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query side, score every
    corpus row, per-query window rank.  (qid, rank, vec_id, cos)."""
    qid, qvec = q_cols
    cid, cvec = c_cols
    # norms as columns: computed once per row instead of once per PAIR
    # (same FP expression order as cosine(), so values are bit-identical)
    cn = corpus.withColumn("_cnorm", _norm(F.col(cvec)))
    qn = queries.withColumn("_qnorm", _norm(F.col(qvec)))
    scored = cn.join(F.broadcast(qn)).withColumn(
        "cos", _dot(F.col(qvec), F.col(cvec)) / (F.col("_qnorm") * F.col("_cnorm"))
    )
    w = Window.partitionBy(qid).orderBy(F.desc("cos"), F.col(cid))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, "rank", cid, "cos")
    )


N_PLANES = 8


def _plane(j: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane j (splitmix-ish, no RNG)."""
    out = []
    for d in range(dim):
        z = (j * 1_000_003 + d * 7919 + 12345) * 2654435761 % (1 << 32)
        out.append((z / float(1 << 32)) * 2.0 - 1.0)
    return out


def _probe_masks(multiprobe: int) -> list[int]:
    """XOR masks for every bucket within Hamming distance <= multiprobe
    (includes the zero mask = the bucket itself)."""
    from itertools import combinations

    masks = [0]
    for r in range(1, min(multiprobe, N_PLANES) + 1):
        for bits in combinations(range(N_PLANES), r):
            masks.append(sum(1 << j for j in bits))
    return masks


def lsh_bucket(vec: Column, dim: int) -> Column:
    """Sign-bit bucket id over N_PLANES deterministic hyperplanes."""
    bucket = F.lit(0)
    for j in range(N_PLANES):
        plane = F.array(*[F.lit(v) for v in _plane(j, dim)])
        bucket = bucket + F.when(_dot(vec, plane) > 0, F.lit(1 << j)).otherwise(0)
    return bucket


def lsh_bucket_sql(vec_expr: str, dim: int) -> str:
    """DuckDB twin of :func:`lsh_bucket` — the hyperplanes are deterministic
    arithmetic, so the bucket id is SQL-expressible: inline each plane as a
    literal DOUBLE[] and sum the sign bits.  Both engines evaluate the dot in
    float64 over the same literals, so the sign agrees except for dots within
    an ulp of zero (probability ~0 for 64-dim pseudo-random planes)."""
    terms = []
    for j in range(N_PLANES):
        arr = "[" + ",".join(repr(v) for v in _plane(j, dim)) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(CAST({vec_expr} AS DOUBLE[]), {arr}) > 0"
            f" THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def probe_masks_sql(multiprobe: int) -> str:
    """The multiprobe XOR-mask list as a SQL array literal."""
    return "[" + ",".join(str(m) for m in _probe_masks(multiprobe)) + "]"


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    q_cols: tuple[str, str] = ("qid", "qvec"),
    c_cols: tuple[str, str] = ("vec_id", "embedding"),
    multiprobe: int = 1,
    broadcast_queries: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates share the query's bucket or any bucket
    at Hamming distance <= multiprobe sign-bit flips — the scale path: the
    corpus side is bucket-partitioned, so each query scores only its
    candidate buckets instead of the full corpus.

    ``broadcast_queries=True`` ships the (probe-exploded) query side to
    every executor so the corpus is scored straight off its scan with no
    bucket shuffle — right whenever the query batch is small (the
    interactive / per-batch lookup shape); the default bucket equi-join is
    the both-sides-large scale path.  Probe-duplicate removal and the
    top-k rank share ONE exchange: after an explicit repartition on qid,
    both window specs (dedup over (qid, cid), rank over qid) are satisfied
    by the same clustering, where dropDuplicates + window needed two."""
    qid, qvec = q_cols
    cid, cvec = c_cols
    cb = corpus.withColumn("bucket", lsh_bucket(F.col(cvec), dim)).withColumn(
        "_cnorm", _norm(F.col(cvec))
    )
    qb = queries.withColumn("bucket0", lsh_bucket(F.col(qvec), dim)).withColumn(
        "_qnorm", _norm(F.col(qvec))
    )
    probes = [
        F.col("bucket0").bitwiseXOR(F.lit(m)) for m in _probe_masks(multiprobe)
    ]
    qb = qb.withColumn("bucket", F.explode(F.array(*probes)))
    joined = (
        cb.join(F.broadcast(qb), "bucket") if broadcast_queries
        else qb.join(cb, "bucket")
    )
    scored = joined.withColumn(
        "cos", _dot(F.col(qvec), F.col(cvec)) / (F.col("_qnorm") * F.col("_cnorm"))
    ).select(qid, cid, "cos")
    wd = Window.partitionBy(qid, cid).orderBy(cid)
    wr = Window.partitionBy(qid).orderBy(F.desc("cos"), F.col(cid))
    return (
        scored.repartition(F.col(qid))
        .withColumn("_dup", F.row_number().over(wd))
        .filter(F.col("_dup") == 1)
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(qid, "rank", cid, "cos")
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int,
    iters: int = 2,
    c_cols: tuple[str, str] = ("vec_id", "embedding"),
    train_cap: int = 65536,
) -> DataFrame:
    """IVF coarse quantizer: deterministic Lloyd k-means on a BOUNDED
    deterministic sample, trained driver-side.

    Sample = the ``train_cap`` rows with smallest xxhash64(id) — a
    deterministic pseudo-random subset that plans as one distributed
    TakeOrdered pass (no global sort, no RNG) and is bounded at
    cap x dim x 8 bytes (~32 MB) regardless of corpus size; seeds = its
    first ``n_centroids`` rows (identical rule to the previous distributed
    formulation).  Training the coarse quantizer on a bounded sample is
    the standard IVF recipe at scale — at 10^12 rows a full-corpus Lloyd
    pass per build would be absurd, while 64k samples pin 16 centroids far
    past statistical noise; list ASSIGNMENT and query PROBING remain fully
    distributed in :func:`ann_ivf_topk`.  (Driver-side training also
    collapses what was a ~10 s, dozen-stage DataFrame DAG into one job +
    microseconds of numpy at bench scale.)

    Iteration parity with the previous distributed version: assignment is
    argmax cosine with ties to the smallest cent_id (argmax takes the
    first maximum; per-row norm scaling cannot reorder or split ties),
    empty lists drop their cent_id (not re-indexed), and components are
    rounded to 6 decimals per iteration so the result is REPRODUCIBLE
    across runs, platforms, and parallelism — which is what lets the
    frozen copy (tools/build_ivf_fixture.py) serve as the DuckDB oracle's
    side table.  Returns (cent_id, cvec)."""
    ids, C = _train_ivf(corpus, n_centroids, iters, c_cols, train_cap)
    return corpus.sparkSession.createDataFrame(
        [(i, c) for i, c in zip(ids, C)],
        "cent_id int, cvec array<double>",
    )


def _train_ivf(
    corpus: DataFrame,
    n_centroids: int,
    iters: int = 2,
    c_cols: tuple[str, str] = ("vec_id", "embedding"),
    train_cap: int = 65536,
) -> tuple[list[int], list[list[float]]]:
    """Driver-side Lloyd trainer behind :func:`ivf_centroids`; returns
    (cent_ids ascending, centroid components) as plain Python values so
    :func:`ann_ivf_topk` can fold the tiny quantizer into literal column
    expressions (n_centroids x dim doubles) instead of a join relation."""
    import numpy as np

    cid, cvec = c_cols
    sample = (
        corpus.select(F.col(cvec).alias("cvec"), F.xxhash64(F.col(cid)).alias("_h"))
        .orderBy("_h")
        .limit(train_cap)
        .toPandas()
    )
    X = np.array([np.asarray(v, dtype=np.float64) for v in sample["cvec"]])
    ids = np.arange(min(n_centroids, len(X)))
    C = X[: len(ids)].copy()
    for _ in range(iters):
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        assign = np.argmax(X @ Cn.T, axis=1)
        keep, new_c = [], []
        for pos in range(len(ids)):
            members = X[assign == pos]
            if len(members):
                keep.append(ids[pos])
                new_c.append(np.round(members.mean(axis=0), 6))
        ids, C = np.array(keep), np.array(new_c)
    return (
        [int(i) for i in ids],
        [[float(v) for v in c] for c in C],
    )


# literal-plan size cap for ann_ivf_topk: n_centroids * dim double
# literals beyond this fall back to the broadcast-join plan (a 16x64
# bench quantizer is 1k literals; 1024x768 would be ~800k)
_IVF_LITERAL_CAP = 32_768


def _ann_ivf_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    nprobe: int,
    q_cols: tuple[str, str],
    c_cols: tuple[str, str],
    ids: list[int],
    C: list[list[float]],
) -> DataFrame:
    """Large-quantizer IVF plan: the trained centroids become a broadcast
    relation; assignment is a broadcast join + max_by aggregation and
    probe selection a per-query window.  Same semantics and tie-breaks
    as the literal plan, one extra exchange each side — used when the
    quantizer is too big to inline (see ``_IVF_LITERAL_CAP``)."""
    qid, qvec = q_cols
    cid, cvec = c_cols
    cents = corpus.sparkSession.createDataFrame(
        [(i, c) for i, c in zip(ids, C)], "cent_id int, cvec array<double>"
    )
    lists = (
        corpus.join(F.broadcast(cents))
        .withColumn("ccos", cosine(F.col(cvec), F.col("cvec")))
        .groupBy(cid, cvec)
        .agg(
            F.max_by(
                "cent_id",
                F.struct("ccos", F.col("cent_id").cast("double") * -1),
            ).alias("cent_id")
        )
    )
    wq = Window.partitionBy(qid).orderBy(F.desc("ccos"), "cent_id")
    probes = (
        queries.join(F.broadcast(cents))
        .withColumn("ccos", cosine(F.col(qvec), F.col("cvec")))
        .withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select(qid, qvec, "cent_id")
    )
    scored = probes.join(lists, "cent_id").withColumn(
        "cos", cosine(F.col(qvec), F.col(cvec))
    )
    w = Window.partitionBy(qid).orderBy(F.desc("cos"), F.col(cid))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, "rank", cid, "cos")
    )


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    q_cols: tuple[str, str] = ("qid", "qvec"),
    c_cols: tuple[str, str] = ("vec_id", "embedding"),
) -> DataFrame:
    """IVF approximate top-k — the inverted-list scale path: the corpus is
    partitioned into n_centroids lists by nearest coarse centroid; each
    query scores only its ``nprobe`` nearest lists (~nprobe/n_centroids of
    the corpus).  (qid, rank, vec_id, cos).

    When the quantizer is small (n_centroids x dim literals under
    ``_IVF_LITERAL_CAP``), both list assignment and probe selection fold
    it into literal column expressions — one shuffle-free projection per
    side, evaluated inside the scan; the only exchanges left are the
    candidate join and the final per-query rank.  A LARGE quantizer
    (say 1024 lists x 768 dims) would bloat that plan with ~800k
    literals, so past the cap the same semantics run as a broadcast join
    + max_by aggregation instead — the knob trades plan size for one
    extra exchange, never correctness.  Ties keep one contract in both
    plans: equal cosine -> smallest cent_id (array_position returns the
    FIRST maximum / max_by breaks ties on negated id; the probe sort
    comparator breaks equal scores by ascending id)."""
    qid, qvec = q_cols
    cid, cvec = c_cols
    ids, C = _train_ivf(corpus, n_centroids, c_cols=c_cols)
    if len(ids) * len(C[0]) > _IVF_LITERAL_CAP:
        return _ann_ivf_topk_join(
            queries, corpus, k, nprobe, q_cols, c_cols, ids, C
        )
    cent_lits = [F.array(*[F.lit(x) for x in c]) for c in C]
    id_arr = F.array(*[F.lit(i) for i in ids])

    def cent_scores(vec) -> list:
        return [cosine(vec, cl) for cl in cent_lits]

    sc = F.array(*cent_scores(F.col(cvec)))
    lists = corpus.withColumn(
        "cent_id",
        F.element_at(
            id_arr, F.array_position(sc, F.array_max(sc)).cast("int")
        ),
    )
    pairs = F.array(
        *[
            F.struct(s.alias("s"), F.lit(i).alias("i"))
            for s, i in zip(cent_scores(F.col(qvec)), ids)
        ]
    )
    ranked = F.array_sort(
        pairs,
        lambda l, r: F.when(l["s"] > r["s"], F.lit(-1))
        .when(l["s"] < r["s"], F.lit(1))
        .otherwise(l["i"] - r["i"]),
    )
    probes = queries.withColumn(
        "cent_id",
        F.explode(F.slice(ranked, 1, min(nprobe, len(ids))).getField("i")),
    ).select(qid, qvec, "cent_id")
    scored = probes.join(lists, "cent_id").withColumn(
        "cos", cosine(F.col(qvec), F.col(cvec))
    )
    w = Window.partitionBy(qid).orderBy(F.desc("cos"), F.col(cid))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, "rank", cid, "cos")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    c_cols: tuple[str, str] = ("vec_id", "embedding"),
    n_blocks: int = 8,
) -> DataFrame:
    """All (a < b) pairs with cosine >= threshold — embedding-space near-dup
    detection, EXACT (the correctness baseline the DuckDB oracle checks;
    the sub-quadratic scale path is :func:`embedding_near_dup_pairs_lsh`).

    Block-triangle plan: rows hash into ``n_blocks`` blocks; each of the
    B(B+1)/2 unordered block pairs becomes one ``applyInPandas`` group
    whose members arrive tagged with the side they play, and the group
    scores its cross product as ONE numpy/BLAS matmul.  Every vector pair
    lands in exactly one block-pair group (the (min,max) of its blocks),
    so no dedup pass is needed.  Shuffle is O(n * B) rows against O(n^2)
    scored pairs — the classic triangle-join trade — and B is the
    parallelism knob; the previous theta-join formulation evaluated an
    interpreted per-pair ``aggregate`` over the arrays, which dominated
    wall time (~8 s -> ~1 s at bench scale, identical output)."""
    import numpy as np
    import pandas as pd

    cid, cvec = c_cols
    spark = corpus.sparkSession
    block_pairs = spark.createDataFrame(
        [(p, q) for p in range(n_blocks) for q in range(p, n_blocks)],
        "p int, q int",
    )
    base = corpus.select(
        F.col(cid).alias("_id"),
        F.col(cvec).alias("_vec"),
        F.pmod(F.xxhash64(F.col(cid)), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    tagged = (
        base.join(F.broadcast(block_pairs), F.col("_blk") == F.col("p"))
        .select("p", "q", "_id", "_vec", F.lit(0).alias("_side"))
        .unionByName(
            base.join(F.broadcast(block_pairs), F.col("_blk") == F.col("q"))
            .select("p", "q", "_id", "_vec", F.lit(1).alias("_side"))
        )
    )

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        p, q = key
        a = pdf[pdf["_side"] == 0]
        if not len(a):
            return empty
        ids_a = a["_id"].to_numpy()
        Xa = np.array([np.asarray(v, dtype=np.float64) for v in a["_vec"]])
        Xa /= np.linalg.norm(Xa, axis=1, keepdims=True)
        if p == q:
            cos = Xa @ Xa.T
            ii, jj = np.nonzero(np.triu(cos >= threshold, k=1))
            id_a, id_b = ids_a[ii], ids_a[jj]
        else:
            b = pdf[pdf["_side"] == 1]
            if not len(b):
                return empty
            ids_b = b["_id"].to_numpy()
            Xb = np.array([np.asarray(v, dtype=np.float64) for v in b["_vec"]])
            Xb /= np.linalg.norm(Xb, axis=1, keepdims=True)
            cos = Xa @ Xb.T
            ii, jj = np.nonzero(cos >= threshold)
            id_a, id_b = ids_a[ii], ids_b[jj]
        lo = np.minimum(id_a, id_b)
        hi = np.maximum(id_a, id_b)
        keep = lo < hi  # drop self-pairs surviving via cos(x,x)=1 on diagonal blocks
        return pd.DataFrame(
            {"id_a": lo[keep], "id_b": hi[keep], "cos": cos[ii, jj][keep]}
        )

    # the pair columns keep the caller's id type (string keys near-dup the
    # same as bigints) — hardcoding long would silently narrow the API
    id_type = dict(corpus.dtypes)[cid]
    return tagged.groupBy("p", "q").applyInPandas(
        score, schema=f"id_a {id_type}, id_b {id_type}, cos double"
    )


def embedding_near_dup_pairs_lsh(
    corpus: DataFrame,
    threshold: float,
    dim: int,
    c_cols: tuple[str, str] = ("vec_id", "embedding"),
    multiprobe: int = 1,
) -> DataFrame:
    """Near-dup pairs at scale: candidates must share an LSH bucket or
    differ in <= ``multiprobe`` sign bits, so the self-join is a bucket
    equi-join (shuffle on bucket) instead of O(n^2).  Approximate: a true
    pair whose vectors disagree on > multiprobe hyperplane signs is missed
    — at near-dup thresholds (cos >= ~0.9) sign flips are rare, and the
    recall-vs-exact gap is pinned by tests.  Emitted exactly once per pair
    (dedup on the probe expansion)."""
    cid, cvec = c_cols
    base = (
        corpus.select(F.col(cid).alias("_id"), F.col(cvec).alias("_vec"))
        .withColumn("bucket0", lsh_bucket(F.col("_vec"), dim))
        .withColumn("_norm", _norm(F.col("_vec")))
    )
    probes = [
        F.col("bucket0").bitwiseXOR(F.lit(m)) for m in _probe_masks(multiprobe)
    ]
    a = base.select(
        F.col("_id").alias("id_a"), F.col("_vec").alias("vec_a"),
        F.col("_norm").alias("norm_a"),
        F.explode(F.array(*probes)).alias("bucket"),
    )
    b = base.select(
        F.col("_id").alias("id_b"), F.col("_vec").alias("vec_b"),
        F.col("_norm").alias("norm_b"),
        F.col("bucket0").alias("bucket"),
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "cos",
            _dot(F.col("vec_a"), F.col("vec_b"))
            / (F.col("norm_a") * F.col("norm_b")),
        )
    )
    return pairs.filter(F.col("cos") >= threshold).select("id_a", "id_b", "cos")
