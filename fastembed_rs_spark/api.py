"""User-facing API facade — the reference's public classes, Spark-shaped.

A fastembed-rs user drives five handle types (src/lib.rs:2-12):

    TextEmbedding::try_new(InitOptions::new(model))  .embed(docs, batch)
    SparseTextEmbedding::try_new(..)                 .embed(docs, batch)
    Bgem3Embedding::try_new(..)                      .embed(docs, batch)
    ImageEmbedding::try_new(..)                      .embed(images, batch)
    TextRerank::try_new(..)                          .rerank(q, docs, return_documents, batch)

This module mirrors those names, init options (src/init.rs:9-80) and call
shapes 1:1, with ONE deliberate change: the primary input/output is a
DataFrame, because on Spark a "list of documents" is a distributed table.
Every handle also keeps a small list-in/list-out convenience method with
the reference's exact signature for interactive use — clearly documented
as driver-side and bounded.

Handles are cheap descriptors: the real session state lives in the
per-executor singleton (models/runtime.py), exactly like the reference
keeps (tokenizer, ort session) per handle (src/text_embedding/init.rs:141-148).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from fastembed_rs_spark.models.registry import (
    ModelSpec,
    get_model_spec,
    list_models,
    register,
)
from fastembed_rs_spark.models.runtime import SessionOptions
from fastembed_rs_spark.session import DEFAULT_BATCH_SIZE


@dataclass
class InitOptions:
    """Mirror of ``InitOptions<M>`` / ``InitOptionsWithLength<M>``
    (src/init.rs:9-34): model_name, execution_providers, cache_dir,
    max_length, intra_threads. ``show_download_progress`` is forwarded to
    artifact resolution (models.artifacts mirrors the reference's
    ``pull_from_hf``; missing artifacts download from ``HF_ENDPOINT`` at
    first session build, or stage ahead with tools/stage_model.py).

    The knobs are PER-HANDLE: they travel to executors inside the UDF
    closure as a ``SessionOptions`` (models.runtime), and sessions are
    cached per (model, options) — two handles with different cache dirs /
    thread counts / EPs never share or retarget each other's sessions
    (unlike r5's process-global env export). The ``FASTEMBED_*`` /
    ``HF_HOME`` env vars remain the default for unset fields, resolved on
    the worker at session-build time.
    """

    model_name: str = "BGESmallENV15"
    execution_providers: list[str] = field(default_factory=list)
    cache_dir: str | None = None
    show_download_progress: bool = True
    max_length: int | None = None
    intra_threads: int | None = None

    # builder-style setters, matching the reference's with_* methods
    def with_max_length(self, n: int) -> "InitOptions":
        self.max_length = n
        return self

    def with_cache_dir(self, d: str) -> "InitOptions":
        self.cache_dir = d
        return self

    def with_intra_threads(self, n: int) -> "InitOptions":
        self.intra_threads = n
        return self

    def with_execution_providers(self, eps: list[str]) -> "InitOptions":
        self.execution_providers = list(eps)
        return self

    @classmethod
    def new(cls, model_name: str) -> "InitOptions":
        return cls(model_name=model_name)


class _Handle:
    """Shared handle mechanics: resolve the spec (kind-scoped, so
    ``SparseTextEmbedding("BAAI/bge-m3")`` finds the sparse entry like the
    reference's per-family from_str), apply InitOptions, derive a
    length-overridden spec when max_length differs (each reference handle
    owns its max_length — src/init.rs:51-57)."""

    KIND: str = "dense"

    def __init__(self, options: InitOptions | str | None = None):
        if options is None:
            options = InitOptions()
        if isinstance(options, str):
            options = InitOptions(model_name=options)
        self.options = options
        spec = get_model_spec(options.model_name, kind=self.KIND)
        if options.max_length is not None and options.max_length != spec.max_length:
            derived = dataclasses.replace(
                spec,
                name=f"{spec.name}#len{options.max_length}",
                max_length=options.max_length,
            )
            spec = register(derived)
        self.spec: ModelSpec = spec
        if options.intra_threads is not None and options.intra_threads < 1:
            raise ValueError(
                f"intra_threads must be >= 1, got {options.intra_threads}"
            )
        # Per-handle session options: ride the UDF closure to executors;
        # unset fields resolve from FASTEMBED_*/HF_HOME env on the worker.
        # An EMPTY execution_providers list is the reference default ("use
        # the default EP", src/init.rs) — the runtime falls back to env
        # then CPUExecutionProvider.
        self.session_options = SessionOptions(
            cache_dir=options.cache_dir,
            intra_threads=options.intra_threads,
            execution_providers=tuple(options.execution_providers),
            show_download_progress=options.show_download_progress,
        )

    # reference: try_new(options) -> Result<Self> (impl.rs:36)
    @classmethod
    def try_new(cls, options: InitOptions | str | None = None):
        return cls(options)

    def _embed_ordered(self, spark: SparkSession, documents: list[str],
                       out_col: str, batch_size: int | None):
        """Shared list-method scaffolding: enumerate → embed → collect →
        restore input order. Returns the raw Row values of ``out_col``;
        empty input short-circuits (reference embed(vec![]) → Ok(vec![]))."""
        if not documents:
            return []
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(documents)], ["__i", "text"]
        )
        rows = self.embed(df, "text", batch_size).select("__i", out_col).collect()
        return [r[out_col] for r in sorted(rows, key=lambda r: r["__i"])]

    @classmethod
    def list_supported_models(cls) -> list[ModelSpec]:
        """Mirror of ``list_supported_models()`` (src/text_embedding/impl.rs:286)."""
        return list_models(cls.KIND)

    @classmethod
    def get_model_info(cls, model_name: str) -> ModelSpec:
        """Mirror of ``get_model_info`` (src/text_embedding/impl.rs:291)."""
        return get_model_spec(model_name, kind=cls.KIND)

    @classmethod
    def try_new_from_user_defined(
        cls,
        name: str,
        dim: int,
        pooling: str = "mean",
        output_key: str | int | None = None,
        max_length: int = 512,
        model_file: str = "model.onnx",
        quantization: str = "none",
        model_bytes: bytes | None = None,
        tokenizer_bytes: bytes | None = None,
        **spec_kwargs,
    ):
        """BYO model for every handle family (``try_new_from_user_defined``
        — src/text_embedding/init.rs:92-139, sparse init.rs:24,
        bgem3 init.rs:31, image init.rs:60, reranking init.rs:116):
        register a spec of this family's kind for a user-supplied export
        and return a handle on it.

        Artifact source options, mirroring ``OnnxSource``
        (src/reranking/init.rs:91-108):

        * File (default): artifacts staged under the cache dir as
          ``<name with / as -->/{model_file, tokenizer.json}`` (e.g. an
          optimum-cli export via tools/stage_model.py).
        * Memory: pass ``model_bytes`` / ``tokenizer_bytes`` (raw bytes or
          a ``spark.sparkContext.broadcast`` of them — the Spark-native
          ship: one copy per executor, not per task). Whatever bytes don't
          supply still resolves from the cache dir.

        ``output_key`` accepts an int for positional selection
        (OutputKey::ByOrder, src/output/output_precedence.rs:11-16).
        Extra ``spec_kwargs`` forward to ``ModelSpec`` (e.g.
        ``sparse_method="bgem3"``, ``vocab_size=...``)."""
        spec = register(ModelSpec(
            name=name, dim=dim, pooling=pooling, output_key=output_key,
            max_length=max_length, model_code=name, model_file=model_file,
            quantization=quantization, kind=cls.KIND, **spec_kwargs,
        ))
        handle = cls(InitOptions(model_name=spec.name))
        if model_bytes is not None or tokenizer_bytes is not None:
            handle.session_options = dataclasses.replace(
                handle.session_options,
                model_bytes=model_bytes,
                tokenizer_bytes=tokenizer_bytes,
            )
        return handle


class TextEmbedding(_Handle):
    """Dense text embedding handle (src/text_embedding/impl.rs:36-449)."""

    KIND = "dense"

    def embed(
        self,
        df: DataFrame,
        text_col: str = "text",
        batch_size: int | None = None,
        out_col: str = "embedding",
        pack_by_length: bool = False,
    ) -> DataFrame:
        """``TextEmbedding::embed(documents, batch_size)``
        (src/text_embedding/impl.rs:432-449), documents as a DataFrame
        column. Appends ``out_col array<float>`` (pooled, L2-normalized)."""
        from fastembed_rs_spark.operators.embed import embed_text

        return embed_text(
            df, text_col, model=self.spec.name, out_col=out_col,
            batch_size=batch_size or DEFAULT_BATCH_SIZE,
            pack_by_length=pack_by_length,
            session_options=self.session_options,
        )

    def embed_stream(
        self,
        stream_df: DataFrame,
        text_col: str = "text",
        batch_size: int | None = None,
        out_col: str = "embedding",
    ) -> DataFrame:
        """Same plan as :meth:`embed` over an unbounded (readStream)
        DataFrame — stateless, so any output mode works
        (streaming/pipelines.py::embed_stream)."""
        from fastembed_rs_spark.operators.embed import embed_text

        return embed_text(
            stream_df, text_col, model=self.spec.name, out_col=out_col,
            batch_size=batch_size or DEFAULT_BATCH_SIZE,
            session_options=self.session_options,
        )

    def embed_list(
        self, spark: SparkSession, documents: list[str],
        batch_size: int | None = None,
    ) -> list[list[float]]:
        """The reference's exact list-in/list-out signature, for
        interactive/driver-side use on SMALL inputs (collects!). Order of
        ``documents`` is preserved."""
        return [
            list(e)
            for e in self._embed_ordered(spark, documents, "embedding", batch_size)
        ]

    @classmethod
    def get_quantization_mode(cls, model_name: str) -> str:
        """Mirror of ``get_quantization_mode`` (src/text_embedding/impl.rs:233):
        'none' | 'static' | 'dynamic' (dynamic carries the single-batch
        embedding constraint enforced at plan-build time)."""
        return get_model_spec(model_name, kind=cls.KIND).quantization

    @classmethod
    def get_default_pooling_method(cls, model_name: str) -> str:
        """Mirror of ``get_default_pooling_method`` (src/text_embedding/impl.rs:158)."""
        return get_model_spec(model_name, kind=cls.KIND).pooling

class SparseTextEmbedding(_Handle):
    """Sparse (SPLADE / BGE-M3) handle (src/sparse_text_embedding/)."""

    KIND = "sparse"

    def embed(
        self,
        df: DataFrame,
        text_col: str = "text",
        batch_size: int | None = None,
        out_col: str = "sparse_embedding",
    ) -> DataFrame:
        """Appends ``struct<indices array<int>, values array<float>>`` —
        SparseEmbedding (src/sparse_text_embedding/impl.rs:202-304)."""
        from fastembed_rs_spark.operators.embed import embed_sparse

        return embed_sparse(
            df, text_col, model=self.spec.name, out_col=out_col,
            batch_size=batch_size or DEFAULT_BATCH_SIZE,
            session_options=self.session_options,
        )

    def embed_list(
        self, spark: SparkSession, documents: list[str],
        batch_size: int | None = None,
    ) -> list[dict[int, float]]:
        """Reference list signature for SMALL inputs (collects!): one
        {vocab_index: weight} map per document, order preserved — the
        SparseEmbedding pairs (src/sparse_text_embedding/init.rs)."""
        return [
            dict(zip(se.indices, se.values))
            for se in self._embed_ordered(
                spark, documents, "sparse_embedding", batch_size
            )
        ]


class Bgem3Embedding(_Handle):
    """Joint dense+sparse+ColBERT handle (src/bgem3_embedding/impl.rs:149-303)."""

    KIND = "bgem3"

    def embed(
        self,
        df: DataFrame,
        text_col: str = "text",
        batch_size: int | None = None,
        out_col: str = "bgem3",
    ) -> DataFrame:
        from fastembed_rs_spark.operators.embed import embed_bgem3

        return embed_bgem3(
            df, text_col, model=self.spec.name, out_col=out_col,
            batch_size=batch_size or DEFAULT_BATCH_SIZE,
            session_options=self.session_options,
        )

    def embed_list(
        self, spark: SparkSession, documents: list[str],
        batch_size: int | None = None,
    ) -> list[dict]:
        """Reference list signature for SMALL inputs (collects!): one
        {dense, sparse, colbert} dict per document, order preserved —
        Bgem3Output (src/bgem3_embedding/init.rs)."""
        return [
            {
                "dense": list(trip.dense),
                "sparse": dict(zip(trip.sparse.indices, trip.sparse.values)),
                "colbert": [list(t) for t in trip.colbert],
            }
            for trip in self._embed_ordered(spark, documents, "bgem3", batch_size)
        ]


class ImageEmbedding(_Handle):
    """Image embedding handle (src/image_embedding/impl.rs:119-266).
    Source a binary column via ``spark.read.format('binaryFile')``
    (sources/io.py::read_images)."""

    KIND = "image"

    def embed(
        self,
        df: DataFrame,
        content_col: str = "content",
        batch_size: int = 64,
        out_col: str = "embedding",
        preprocessor_config: dict | None = None,
    ) -> DataFrame:
        from fastembed_rs_spark.operators.embed import embed_image

        return embed_image(
            df, content_col, model=self.spec.name, out_col=out_col,
            batch_size=batch_size, preprocessor_config=preprocessor_config,
            session_options=self.session_options,
        )


class TextRerank(_Handle):
    """Cross-encoder reranking handle (src/reranking/impl.rs:48-196)."""

    KIND = "rerank"

    def rerank(
        self,
        pairs: DataFrame,
        query_col: str = "query",
        doc_col: str = "document",
        return_documents: bool = True,
        batch_size: int | None = None,
        query_id: str = "query_id",
        doc_id: str = "doc_id",
        k: int | None = None,
    ) -> DataFrame:
        """``TextRerank::rerank(query, documents, return_documents,
        batch_size)`` (src/reranking/impl.rs:109-196) over a (query ×
        candidate) pair DataFrame: model-scores each pair, ranks per query
        desc (ties break on ``doc_id`` asc). ``return_documents=False``
        drops the document text before the rank shuffle
        (RerankResult.document Option, src/reranking/init.rs:131-136)."""
        from pyspark.sql import functions as F

        from fastembed_rs_spark.operators.embed import rerank_score
        from fastembed_rs_spark.operators.rerank import rerank as rank

        scored = rerank_score(
            pairs, query_col, doc_col, model=self.spec.name, out_col="__raw",
            batch_size=batch_size or DEFAULT_BATCH_SIZE,
            session_options=self.session_options,
        )
        return rank(
            scored, F.col("__raw").cast("double"), k=k, query_id=query_id,
            doc_id=doc_id, return_documents=return_documents,
            document_col=doc_col, round_to=None,
        ).drop("__raw")

    def rerank_list(
        self,
        spark: SparkSession,
        query: str,
        documents: list[str],
        return_documents: bool = True,
        batch_size: int | None = None,
    ) -> list[dict]:
        """The reference's exact single-query signature for SMALL inputs
        (collects!). Returns [{index, score, document?}] sorted score desc —
        RerankResult (src/reranking/init.rs:126-137)."""
        if not documents:
            return []
        pairs = spark.createDataFrame(
            [(0, i, query, d) for i, d in enumerate(documents)],
            ["query_id", "index", "query", "document"],
        )
        out = self.rerank(
            pairs, "query", "document",
            return_documents=return_documents, batch_size=batch_size,
            query_id="query_id", doc_id="index",
        )
        rows = sorted(out.collect(), key=lambda r: r["rank"])
        return [
            {
                "index": r["index"],
                "score": r["score"],
                **({"document": r["document"]} if return_documents else {}),
            }
            for r in rows
        ]
