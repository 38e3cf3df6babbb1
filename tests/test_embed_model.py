"""The learned-model embedding path (embed_documents(model="numpy")):
proves the production mapInPandas slot end to end with a committed
tiny numpy MLP, so a real sentence-transformers checkpoint is a
drop-in (reference components/core/embedding_service.py:64-122).

Gates (VERDICT r4 ask #6): batch-size invariance, partitioning
invariance, self-retrieval, and cosine-topk stability against the
feature-hash baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import embed, knn


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return fio.load_table(spark, sf_small, "documents").select(
        "doc_id", "text"
    )


def _vecs(df, id_col="doc_id"):
    return {r[0]: tuple(r[1]) for r in df.collect()}


def test_numpy_model_schema_and_norms(docs):
    out = embed.embed_documents(docs, model="numpy")
    assert out.columns == ["doc_id", "embedding"]
    rows = out.limit(20).collect()
    assert rows and all(len(r.embedding) == 64 for r in rows)
    for r in rows:
        n2 = sum(x * x for x in r.embedding)
        assert abs(n2 - 1.0) < 1e-9 or n2 == 0.0


def test_numpy_model_batch_size_invariance(docs):
    """encode(batch_size=7) == encode(batch_size=64) per row: the
    forward pass must be row-independent regardless of where the
    micro-batch boundaries fall. Tolerance 1e-12, not bit equality:
    BLAS GEMM picks kernels (and therefore dot-product summation
    order) by matrix SHAPE, so a 7-row and a 64-row chunk of the same
    rows can differ in the last ulp on some BLAS builds — r11 measured
    max |Δ| = 1.1e-16 on this box with byte-identical forward code at
    both chunk sizes (and the same 1-ulp drift reproduces at the
    pre-r11 commit, so this is an environment property, not a code
    regression). Semantic row-independence — no cross-row state, no
    boundary effects — is what the gate pins. The relaxation stays
    contained because every consumer of the numpy embedding rounds
    scores to 6 dp before comparison/ranking (model_rerank,
    cross_rerank, chunk_search et al.), which absorbs last-ulp
    drift; a consumer that compared raw floats across partitionings
    would need the bit gate back (ADVICE r11)."""
    a = _vecs(embed.embed_documents(docs, model="numpy", batch_size=7))
    b = _vecs(embed.embed_documents(docs, model="numpy", batch_size=64))
    assert set(a) == set(b)
    for k in a:
        assert len(a[k]) == len(b[k])
        assert all(abs(x - y) < 1e-12 for x, y in zip(a[k], b[k])), k


def test_numpy_model_partitioning_invariance(docs):
    """1 partition vs 8: same vectors — no cross-partition state.
    Same 1e-12 tolerance as the batch-size gate (partitioning changes
    the tail chunk shapes, and BLAS kernels are shape-dependent)."""
    a = _vecs(embed.embed_documents(docs.repartition(1), model="numpy"))
    b = _vecs(embed.embed_documents(docs.repartition(8), model="numpy"))
    assert set(a) == set(b)
    for k in a:
        assert len(a[k]) == len(b[k])
        assert all(abs(x - y) < 1e-12 for x, y in zip(a[k], b[k])), k


def test_numpy_model_rejects_unknown_model(docs):
    with pytest.raises(ValueError, match="unknown embed model"):
        embed.embed_documents(docs, model="bert")


def test_numpy_model_null_text_is_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hello world")],
        "doc_id long, text string",
    )
    v = _vecs(embed.embed_documents(df, model="numpy"))
    assert v[1] == v[2] == tuple([0.0] * 64)
    assert any(x != 0.0 for x in v[3])


def test_numpy_model_self_retrieval(spark, docs):
    """Embedding a doc's own text as the query must retrieve that doc
    at rank 1 with score ~1 — the end-to-end query→embed→top-k loop
    of the reference's search_detailed, on the model path."""
    corpus = embed.embed_documents(docs, model="numpy").withColumnRenamed(
        "doc_id", "vec_id"
    )
    for target in (5, 42):
        qtext = docs.where(F.col("doc_id") == target).first().text
        qdf = spark.createDataFrame([(0, qtext)], "doc_id long, text string")
        qvec = embed.embed_documents(qdf, model="numpy").select(
            F.col("embedding").alias("query_vec")
        )
        top = knn.topk(corpus, qvec, k=3).collect()
        assert top[0].vec_id == target
        assert top[0].score > 0.999


def test_numpy_model_topk_stability_vs_hash_baseline(spark, docs):
    """The MLP embeds the same hashed-count features, so its cosine
    neighborhoods must stay correlated with the feature-hash
    baseline's: mean top-10 overlap over a query sample well above
    the ~10/N random-agreement floor."""
    hash_emb = embed.embed_documents(docs).withColumnRenamed(
        "doc_id", "vec_id"
    ).cache()
    mlp_emb = embed.embed_documents(docs, model="numpy").withColumnRenamed(
        "doc_id", "vec_id"
    ).cache()
    try:
        overlaps = []
        for qid in (5, 42, 99):
            tops = []
            for emb_df in (hash_emb, mlp_emb):
                q = emb_df.where(F.col("vec_id") == qid).select(
                    F.col("embedding").alias("query_vec")
                )
                tops.append({
                    r.vec_id for r in knn.topk(emb_df, q, k=10).collect()
                })
            overlaps.append(len(tops[0] & tops[1]) / 10)
        assert sum(overlaps) / len(overlaps) >= 0.6, overlaps
    finally:
        hash_emb.unpersist()
        mlp_emb.unpersist()


# --- real checkpoint (skip-gated: needs sentence-transformers) ---------

# no module-level importorskip: that would skip the WHOLE file,
# including the numpy-path gates above — gate per-test instead

try:
    import sentence_transformers  # noqa: F401
    _HAS_ST = True
except ImportError:
    _HAS_ST = False

needs_st = pytest.mark.skipif(
    not _HAS_ST, reason="sentence-transformers not installed in this env"
)

_ST_CHECKPOINT = "all-MiniLM-L6-v2"  # small public checkpoint


def test_st_model_errors_clearly_when_absent(docs):
    if _HAS_ST:
        pytest.skip("library present: covered by the real-checkpoint gates")
    with pytest.raises(ImportError, match="sentence-transformers"):
        embed.embed_documents(docs, model=f"st:{_ST_CHECKPOINT}").collect()


@needs_st
def test_st_model_schema_norms_and_batch_invariance(docs):
    """The real-checkpoint twin of the numpy gates (reference
    embedding_service.py:64-122): normalized vectors, stable schema,
    batch-size invariance through the same mapInPandas slot."""
    sample = docs.limit(32)
    out = embed.embed_documents(sample, model=f"st:{_ST_CHECKPOINT}",
                                batch_size=8)
    assert out.columns == ["doc_id", "embedding"]
    rows = out.collect()
    assert rows and all(len(r.embedding) == len(rows[0].embedding)
                        for r in rows)
    for r in rows:
        assert abs(sum(x * x for x in r.embedding) - 1.0) < 1e-5
    b = _vecs(embed.embed_documents(sample, model=f"st:{_ST_CHECKPOINT}",
                                    batch_size=32))
    a = {r.doc_id: tuple(r.embedding) for r in rows}
    for k in a:
        assert max(abs(x - y) for x, y in zip(a[k], b[k])) < 1e-5


@needs_st
def test_st_model_self_retrieval(spark, docs):
    corpus = embed.embed_documents(
        docs.limit(64), model=f"st:{_ST_CHECKPOINT}"
    ).withColumnRenamed("doc_id", "vec_id")
    target = 5
    qtext = docs.where(F.col("doc_id") == target).first().text
    qdf = spark.createDataFrame([(0, qtext)], "doc_id long, text string")
    qvec = embed.embed_documents(qdf, model=f"st:{_ST_CHECKPOINT}").select(
        F.col("embedding").alias("query_vec")
    )
    top = knn.topk(corpus, qvec, k=3).collect()
    assert top[0].vec_id == target
    assert top[0].score > 0.99


# --- rag_context (retrieve -> budgeted context assembly) ---------------


@pytest.fixture(scope="module")
def rag_docs(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma"),
        (3, "alpha beta"),
        (4, "unrelated words entirely different topic"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rag_context_orders_by_relevance_and_packs(rag_docs):
    out = embed.rag_context(
        rag_docs, "alpha beta gamma delta", k=3, token_budget=7
    ).collect()[0]
    # doc 1 is the exact match (rank 1, 4 tokens); doc 2 next (3
    # tokens, cum 7 fits); doc 3 would overflow the budget
    assert out.n_docs == 2 and out.n_tokens == 7
    assert out.context.startswith("[Document 1] (Relevance: ")
    assert "\n\n[Document 2] (Relevance: " in out.context
    assert "alpha beta gamma delta" in out.context
    assert "unrelated" not in out.context


def test_rag_context_zero_budget_yields_empty_row(rag_docs):
    out = embed.rag_context(
        rag_docs, "alpha beta", k=3, token_budget=0
    ).collect()[0]
    assert (out.context, out.n_docs, out.n_tokens) == ("", 0, 0)


def test_rag_context_broadcasts_hit_list(rag_docs):
    df = embed.rag_context(rag_docs, "alpha beta", k=3, token_budget=100)
    assert "BroadcastHashJoin" in df._jdf.queryExecution().executedPlan().toString() or \
           "BroadcastHashJoin" in df._jdf.queryExecution().toString()


def test_diversified_search_enforces_source_cap(spark):
    rows = [
        (i, "alpha beta gamma", f"src{0 if i < 5 else 1}")
        for i in range(8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = embed.diversified_search(
        docs, "alpha beta gamma", k=4, per_source_cap=2, pool=8
    ).collect()
    assert len(out) == 4
    from collections import Counter
    by_src = Counter(r.source for r in out)
    assert max(by_src.values()) <= 2
    # plain top-k would take doc_ids 0-3, all src0; the cap forces
    # src1 rows in
    assert by_src == {"src0": 2, "src1": 2}
    assert all(r.source_rank <= 2 for r in out)


def test_rag_context_survives_hostile_text(spark):
    """Percent signs (format-string args, not templates), unicode,
    newlines, and NULL text must flow through assembly unharmed."""
    rows = [
        (1, "alpha beta 100% gros %s %d %% legit"),
        (2, "alpha ümläut 中文 line\nbreak beta"),
        (3, None),
        (4, "alpha beta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = embed.rag_context(docs, "alpha beta", k=4, token_budget=50).collect()[0]
    assert out.n_docs >= 2
    assert "100% gros %s %d %%" in out.context
    assert "ümläut" in out.context


def test_diversified_search_null_source_groups_together(spark):
    rows = [
        (1, "alpha beta", None),
        (2, "alpha beta", None),
        (3, "alpha beta", None),
        (4, "alpha beta", "src1"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = embed.diversified_search(
        docs, "alpha beta", k=4, per_source_cap=2, pool=4
    ).collect()
    # NULL sources form one group: capped at 2, so src1 makes it 3
    assert len(out) == 3
    assert sum(1 for r in out if r.source is None) == 2
