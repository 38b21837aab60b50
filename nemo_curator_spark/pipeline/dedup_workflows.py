"""High-level deduplication workflows — reference
stages/deduplication/exact/workflow.py:38-291,
fuzzy/workflow.py:40-420, semantic/workflow.py:40-330, and the
``WorkflowRunResult`` container from pipeline/workflow.py:23-56.

The reference wires its stages through a Ray actor-pool executor with
cudf/RMM memory knobs; here each workflow is the same logical plan on
Spark: one DataFrame chain per phase, intermediates persisted as
parquet at the reference's cache/output layout (``MinHashStage/``,
``ExactDuplicateIds/``, ``FuzzyDuplicateIds/``, …) so a resumed or
downstream removal job finds them where the reference would put them.
The id-generator registry is written next to the outputs under the
reference's filenames (``exact_id_generator.json`` /
``fuzzy_id_generator.json``).

Parameter surfaces mirror the reference, including contracts like
``perform_removal`` raising (the reference's own "Removal is not
implemented yet" — removal composes separately via
``pipeline/removal_workflow.py``), the ``char_ngrams < 20``
false-positive warning, and the ``bands_per_iteration`` bounds check.
GPU-executor knobs (``rmm_pool_size``, ``spill_memory_limit``,
``bands_per_iteration`` batching, ``env_vars``) are accepted for
config compatibility and documented as no-ops — Spark's shuffle
manager plays that role.

Scale shape: everything stays DataFrame-native — the only driver-side
state is the id-generator registry (one entry per input FILE, tiny at
any scale) and phase timings.
"""

from __future__ import annotations

import os
import time
import warnings
from dataclasses import dataclass, field
from typing import Any, Literal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nemo_curator_spark.operators import dedup as DD
from nemo_curator_spark.operators import id_generator as IG
from nemo_curator_spark.operators import semantic as SEM

EXACT_ID_GENERATOR_OUTPUT_FILENAME = "exact_id_generator.json"
FUZZY_ID_GENERATOR_OUTPUT_FILENAME = "fuzzy_id_generator.json"


@dataclass
class WorkflowRunResult:
    """pipeline/workflow.py:23-56, exact container contract (Spark
    DataFrames stand in for the reference's Task lists)."""

    workflow_name: str
    pipeline_tasks: dict[str, list] = field(default_factory=dict)
    metadata: dict[str, Any] = field(default_factory=dict)

    def add_pipeline_tasks(self, pipeline_name: str, tasks: list | None) -> None:
        self.pipeline_tasks[pipeline_name] = list(tasks or [])

    def extend_metadata(self, updates: dict[str, Any] | None = None) -> None:
        if updates:
            self.metadata.update(updates)

    def add_metadata(self, key: str, value: Any) -> None:
        self.metadata[key] = value

    def get_metadata(self, key: str) -> Any:
        return self.metadata.get(key)


def _read_input(
    spark: SparkSession,
    input_path: str | list[str],
    input_filetype: str,
    read_kwargs: dict | None = None,
    input_file_extensions: list[str] | None = None,
) -> DataFrame:
    """``read_kwargs`` pass straight to the Spark reader as options
    (the reference forwards them to its readers the same way; Spark's
    storage credentials travel via hadoop conf, so storage_options is
    dropped with the rest of the reader seeing real option names).
    A single ``input_file_extensions`` entry maps to pathGlobFilter."""
    paths = [input_path] if isinstance(input_path, str) else list(input_path)
    reader = spark.read
    opts = dict(read_kwargs or {})
    opts.pop("storage_options", None)
    if input_file_extensions and len(input_file_extensions) == 1:
        opts.setdefault(
            "pathGlobFilter", f"*{input_file_extensions[0]}"
        )
    if opts:
        reader = reader.options(**opts)
    if input_filetype == "jsonl":
        return reader.json(paths)
    if input_filetype == "parquet":
        return reader.parquet(*paths)
    msg = f"Unsupported input_filetype: {input_filetype!r}"
    raise ValueError(msg)


def _resolve_input(
    workflow: Any, spark: SparkSession, input_df: DataFrame | None
) -> DataFrame:
    """The reference's initial_tasks-vs-input_path contract
    (workflow.py:184-193): an explicit frame wins (with a warning if
    both were given); otherwise input_path is required."""
    if input_df is not None:
        if workflow.input_path is not None:
            warnings.warn(
                "Ignoring input_path as input_df is provided.",
                stacklevel=3,
            )
        return input_df
    if workflow.input_path is None:
        msg = (
            "input_path to the dataset must be provided if input_df is "
            "not provided manually."
        )
        raise ValueError(msg)
    return _read_input(
        spark,
        workflow.input_path,
        workflow.input_filetype,
        getattr(workflow, "read_kwargs", None),
        getattr(workflow, "input_file_extensions", None),
    )


def _assign_ids(
    df: DataFrame, gen_path: str, order_text_col: str
) -> tuple[DataFrame, str]:
    """Always-on id assignment (the reference creates the id-generator
    actor unconditionally): per-file contiguous ranges keyed by the
    scan's file names, row order inside a file by text hash. Identical
    texts may swap ids between runs — the assigned id SET per file is
    still deterministic, which is what removal consumes. The registry
    (one entry per file) is persisted at ``gen_path`` for the removal
    pipeline, resuming an existing registry when present."""
    gen = (
        IG.IdGeneratorBase.from_disk(gen_path)
        if os.path.exists(gen_path)
        else IG.IdGeneratorBase()
    )
    # non-file-backed frames have input_file_name() = '' for every row,
    # which would funnel the whole dataset through ONE window partition
    # (a single-task global sort); fall back to the Spark partition id
    # as the batch key — parallel, and stable for a given partitioning
    # (file-backed scans keep full rerun-stable ids)
    with_file = df.withColumn(
        "_file",
        F.when(
            F.input_file_name() == "",
            F.concat(F.lit("mem-"), F.spark_partition_id().cast("string")),
        ).otherwise(F.input_file_name()),
    ).withColumn("_order", F.xxhash64(F.col(order_text_col)))
    out = IG.assign_dedup_ids(
        with_file, gen, "_file", "_order", id_col=IG.CURATOR_DEDUP_ID_STR
    ).drop("_file", "_order")
    parent = os.path.dirname(gen_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    gen.to_disk(gen_path)
    return out, IG.CURATOR_DEDUP_ID_STR


class ExactDeduplicationWorkflow:
    """exact/workflow.py:38-291: FilePartitioning -> hash-the-column
    identification -> duplicate-id parquet. Spark's scan planning
    replaces the partitioning stage; ``input_blocksize`` maps to
    ``spark.sql.files.maxPartitionBytes`` territory and is accepted for
    config parity."""

    def __init__(  # noqa: PLR0913
        self,
        output_path: str,
        input_path: str | list[str] | None = None,
        input_filetype: Literal["jsonl", "parquet"] = "parquet",
        input_blocksize: str | int = "2GiB",
        identification_batchsize: int = 1,
        input_file_extensions: list[str] | None = None,
        read_kwargs: dict[str, Any] | None = None,
        write_kwargs: dict[str, Any] | None = None,
        assign_id: bool = True,
        id_field: str | None = None,
        text_field: str = "text",
        perform_removal: bool = False,
        total_nparts: int | None = None,
        env_vars: dict[str, Any] | None = None,
    ) -> None:
        self.output_path = output_path
        self.input_path = input_path
        self.input_filetype = input_filetype
        self.input_blocksize = input_blocksize
        self.identification_batchsize = identification_batchsize
        self.input_file_extensions = input_file_extensions
        self.read_kwargs = read_kwargs
        self.write_kwargs = write_kwargs
        self.assign_id = assign_id
        self.id_field = id_field
        self.text_field = text_field
        self.perform_removal = perform_removal
        self.total_nparts = total_nparts
        self.env_vars = env_vars
        self._validate_inputs()

    def _validate_inputs(self) -> None:
        if self.perform_removal:
            msg = "Removal is not implemented yet"
            raise NotImplementedError(msg)
        if not self.assign_id and self.id_field is None:
            msg = "id_field must be provided when assign_id is False"
            raise ValueError(msg)

    def run(
        self, spark: SparkSession, input_df: DataFrame | None = None
    ) -> WorkflowRunResult:
        result = WorkflowRunResult(workflow_name="exact_deduplication")
        total_start = time.time()
        df = _resolve_input(self, spark, input_df)

        id_generator_path = None
        if self.assign_id:
            id_generator_path = os.path.join(
                self.output_path, EXACT_ID_GENERATOR_OUTPUT_FILENAME
            )
            df, id_field = _assign_ids(df, id_generator_path, self.text_field)
        else:
            id_field = self.id_field

        t0 = time.time()
        removal_ids = DD.exact_duplicate_ids(
            df, text_col=self.text_field, id_col=id_field
        )
        ids_path = os.path.join(self.output_path, "ExactDuplicateIds")
        nparts = self.total_nparts or max(
            1, df.rdd.getNumPartitions() // 3
        )
        removal_ids.repartition(max(1, nparts)).write.mode(
            "overwrite"
        ).parquet(ids_path)
        identification_time = time.time() - t0
        num_duplicates = spark.read.parquet(ids_path).count()

        result.add_metadata("identification_time", identification_time)
        result.extend_metadata(
            {
                "total_time": time.time() - total_start,
                "num_duplicates": num_duplicates,
                "id_generator_path": id_generator_path,
                "duplicate_ids_path": ids_path,
            }
        )
        return result


class FuzzyDeduplicationWorkflow:
    """fuzzy/workflow.py:40-420: minhash -> LSH banding -> edges ->
    connected components -> duplicate ids, with the minhash signatures
    persisted under ``cache_path/MinHashStage`` (the reference's resume
    seam) and duplicate ids under ``output_path/FuzzyDuplicateIds``.
    ``use_64_bit_hash`` and ``bands_per_iteration`` are accepted for
    config parity (one Arrow pass computes all permutations; Spark's
    shuffle replaces the banded-iteration memory control)."""

    def __init__(  # noqa: PLR0913
        self,
        cache_path: str,
        output_path: str,
        input_path: str | list[str] | None = None,
        input_filetype: Literal["jsonl", "parquet"] = "parquet",
        input_blocksize: str | int = "1GiB",
        input_file_extensions: list[str] | None = None,
        read_kwargs: dict[str, Any] | None = None,
        cache_kwargs: dict[str, Any] | None = None,
        write_kwargs: dict[str, Any] | None = None,
        text_field: str = "text",
        perform_removal: bool = False,
        seed: int = 42,
        char_ngrams: int = 24,
        num_bands: int = 20,
        minhashes_per_band: int = 13,
        use_64_bit_hash: bool = False,
        bands_per_iteration: int = 5,
        lsh_num_output_partitions: int | None = None,
        env_vars: dict[str, Any] | None = None,
    ) -> None:
        self.cache_path = cache_path
        self.output_path = output_path
        self.input_path = input_path
        self.input_filetype = input_filetype
        self.input_blocksize = input_blocksize
        self.input_file_extensions = input_file_extensions
        self.read_kwargs = read_kwargs
        self.cache_kwargs = cache_kwargs
        self.write_kwargs = write_kwargs
        self.text_field = text_field
        self.perform_removal = perform_removal
        self.seed = seed
        self.char_ngrams = char_ngrams
        self.num_bands = num_bands
        self.minhashes_per_band = minhashes_per_band
        self.use_64_bit_hash = use_64_bit_hash
        self.bands_per_iteration = bands_per_iteration
        self.lsh_num_output_partitions = lsh_num_output_partitions
        self.env_vars = env_vars
        self._validate_inputs()

    @property
    def num_hashes(self) -> int:
        return self.num_bands * self.minhashes_per_band

    def _validate_inputs(self) -> None:
        if self.char_ngrams < 20:  # noqa: PLR2004
            warnings.warn(
                "Using a small char_ngrams value might lead to a large "
                "number (~5%) of false positives during deduplication. "
                "Using a value of at least 20 for char_ngrams is "
                "recommended.",
                stacklevel=3,
            )
        if self.perform_removal:
            msg = "Removal is not implemented yet"
            raise NotImplementedError(msg)
        if (
            self.bands_per_iteration < 1
            or self.bands_per_iteration > self.num_bands
        ):
            msg = "bands_per_iteration must be between [1, num_bands]"
            raise ValueError(msg)

    def run(
        self, spark: SparkSession, input_df: DataFrame | None = None
    ) -> WorkflowRunResult:
        result = WorkflowRunResult(workflow_name="fuzzy_deduplication")
        total_start = time.time()
        df = _resolve_input(self, spark, input_df)

        id_generator_path = os.path.join(
            self.output_path, FUZZY_ID_GENERATOR_OUTPUT_FILENAME
        )
        df, id_field = _assign_ids(df, id_generator_path, self.text_field)
        result.add_metadata("id_generator_path", id_generator_path)

        # Step 1: minhash signatures, persisted (the resume seam)
        t0 = time.time()
        minhash_path = os.path.join(self.cache_path, "MinHashStage")
        DD.add_minhash(
            df.select(id_field, self.text_field),
            text_col=self.text_field,
            num_perms=self.num_hashes,
            shingle_width=self.char_ngrams,
            seed=self.seed,
        ).drop(self.text_field).write.mode("overwrite").parquet(minhash_path)
        result.add_metadata("minhash_time", time.time() - t0)

        # Step 2: LSH banding -> star edges
        t0 = time.time()
        sigs = spark.read.parquet(minhash_path)
        pairs = DD.lsh_candidate_pairs(
            sigs,
            id_col=id_field,
            sig_col="minhash",
            num_bands=self.num_bands,
            num_perms=self.num_hashes,
        )
        if self.lsh_num_output_partitions:
            pairs = pairs.repartition(self.lsh_num_output_partitions)
        edges_path = os.path.join(self.cache_path, "BucketsToEdges")
        pairs.write.mode("overwrite").parquet(edges_path)
        result.add_metadata("lsh_time", time.time() - t0)

        # Step 3: connected components -> duplicate ids
        t0 = time.time()
        edges = spark.read.parquet(edges_path)
        comps = DD.connected_components(edges, strict=False)
        removal_ids = comps.where(F.col("id") != F.col("comp")).select(
            F.col("id").alias(id_field)
        )
        ids_path = os.path.join(self.output_path, "FuzzyDuplicateIds")
        removal_ids.write.mode("overwrite").parquet(ids_path)
        result.add_metadata(
            "connected_components_time", time.time() - t0
        )
        num_duplicates = spark.read.parquet(ids_path).count()
        result.extend_metadata(
            {
                "total_time": time.time() - total_start,
                "num_duplicates": num_duplicates,
                "duplicate_ids_path": ids_path,
            }
        )
        return result


class SemanticDeduplicationWorkflow:
    """semantic/workflow.py:40-330: kmeans -> within-cluster pairwise
    ranking -> (optionally, when ``eps`` is given) duplicate
    identification at ``cosine_sim_score >= 1 - eps``. Scores persist
    under ``cache_path/SemanticPairwise``; ids under
    ``output_path/SemanticDuplicateIds``. ``distance_metric='l2'`` and
    a custom ``ranking_strategy`` are the documented unported pieces
    (SemDeDup itself is cosine)."""

    def __init__(  # noqa: PLR0913
        self,
        input_path: str | list[str] | None,
        output_path: str,
        n_clusters: int,
        cache_path: str | None = None,
        id_field: str = "id",
        embedding_field: str = "embeddings",
        embedding_dim: int | None = None,
        metadata_fields: list[str] | None = None,
        input_filetype: Literal["parquet", "jsonl"] = "parquet",
        input_file_extensions: list[str] | None = None,
        max_iter: int = 300,
        tol: float = 1e-4,
        random_state: int = 42,
        which_to_keep: Literal["hard", "easy", "random"] = "hard",
        distance_metric: Literal["cosine", "l2"] = "cosine",
        ranking_strategy: "SEM.RankingStrategy | dict | None" = None,
        pairwise_batch_size: int = 1024,
        eps: float | None = None,
    ) -> None:
        if distance_metric != "cosine":
            msg = (
                "distance_metric='l2' is not ported — SemDeDup ranking "
                "here is cosine (reference pairwise.py's l2 branch is "
                "the unported piece)"
            )
            raise NotImplementedError(msg)
        self.input_path = input_path
        self.output_path = output_path
        self.n_clusters = n_clusters
        self.cache_path = cache_path or output_path
        self.id_field = id_field
        self.embedding_field = embedding_field
        self.embedding_dim = embedding_dim
        self.metadata_fields = metadata_fields
        self.input_filetype = input_filetype
        self.input_file_extensions = input_file_extensions
        self.max_iter = max_iter
        self.tol = tol
        self.random_state = random_state
        self.which_to_keep = which_to_keep
        if isinstance(ranking_strategy, dict):
            ranking_strategy = SEM.RankingStrategy(**ranking_strategy)
        self.ranking_strategy = ranking_strategy
        self.pairwise_batch_size = pairwise_batch_size
        self.eps = eps

    def run(
        self, spark: SparkSession, input_df: DataFrame | None = None
    ) -> WorkflowRunResult:
        result = WorkflowRunResult(workflow_name="semantic_deduplication")
        total_start = time.time()
        df = _resolve_input(self, spark, input_df)

        t0 = time.time()
        scores = SEM.semantic_scores(
            df,
            id_col=self.id_field,
            vec_col=self.embedding_field,
            k=self.n_clusters,
            seed=self.random_state,
            which_to_keep=self.which_to_keep,
            ranking_strategy=self.ranking_strategy,
            kmeans_max_iter=self.max_iter,
            kmeans_tol=self.tol,
        )
        scores_path = os.path.join(self.cache_path, "SemanticPairwise")
        scores.write.mode("overwrite").parquet(scores_path)
        result.add_metadata("pairwise_time", time.time() - t0)
        result.add_metadata("pairwise_scores_path", scores_path)

        ids_path = None
        num_duplicates = None
        if self.eps is not None:
            t0 = time.time()
            threshold = 1.0 - self.eps
            removal_ids = (
                spark.read.parquet(scores_path)
                .where(F.col("cosine_sim_score") >= threshold)
                .select(F.col("id").alias(self.id_field))
            )
            ids_path = os.path.join(
                self.output_path, "SemanticDuplicateIds"
            )
            removal_ids.write.mode("overwrite").parquet(ids_path)
            result.add_metadata("identify_time", time.time() - t0)
            num_duplicates = spark.read.parquet(ids_path).count()

        result.extend_metadata(
            {
                "total_time": time.time() - total_start,
                "num_duplicates": num_duplicates,
                "duplicate_ids_path": ids_path,
            }
        )
        return result


class TextSemanticDeduplicationWorkflow:
    """End-to-end TEXT semantic dedup (reference
    text/deduplication/semantic.py:52-520): embedding generation ->
    semantic dedup -> (unlike the exact/fuzzy workflows) actual
    duplicate REMOVAL, with optional resumable id assignment. The
    vLLM/HF embedding model named by ``model_identifier`` is the plug
    point — ``embedder`` injects any object with
    ``apply(df, text_col) -> df+embedding`` (default: the deterministic
    hashed-projection EmbedderStage; swap in
    ``classifiers.EmbedderStage(model=...)`` with a MiniTransformer or
    a real sentence-transformer)."""

    def __init__(  # noqa: PLR0913
        self,
        input_path: str | list[str] | None,
        output_path: str,
        cache_path: str | None = None,
        *,
        perform_removal: bool = True,
        text_field: str = "text",
        embedding_field: str = "embeddings",
        model_identifier: str = "google/embeddinggemma-300m",
        embedding_max_chars: int | None = None,
        n_clusters: int = 100,
        id_field: str = IG.CURATOR_DEDUP_ID_STR,
        which_to_keep: Literal["hard", "easy", "random"] = "hard",
        distance_metric: Literal["cosine", "l2"] = "cosine",
        ranking_strategy: "SEM.RankingStrategy | dict | None" = None,
        eps: float | None = 0.01,
        kmeans_random_state: int = 42,
        use_id_generator: bool = False,
        id_generator_state_file: str | None = None,
        input_filetype: Literal["jsonl", "parquet"] = "parquet",
        output_filetype: Literal["jsonl", "parquet"] = "parquet",
        output_fields: list[str] | None = None,
        embedder: Any = None,
    ) -> None:
        self.input_path = input_path
        self.output_path = output_path
        self.cache_path = cache_path or output_path
        self.perform_removal = perform_removal
        self.text_field = text_field
        self.embedding_field = embedding_field
        self.model_identifier = model_identifier
        self.embedding_max_chars = embedding_max_chars
        self.n_clusters = n_clusters
        self.id_field = id_field
        self.which_to_keep = which_to_keep
        self.ranking_strategy = ranking_strategy
        self.eps = eps
        self.kmeans_random_state = kmeans_random_state
        self.use_id_generator = use_id_generator
        self.id_generator_state_file = id_generator_state_file
        self.input_filetype = input_filetype
        self.output_filetype = output_filetype
        self.output_fields = output_fields
        self.embedder = embedder
        if perform_removal and eps is None:
            msg = "eps must be set when perform_removal is True"
            raise ValueError(msg)
        # distance_metric validated by the inner workflow
        self._inner = SemanticDeduplicationWorkflow(
            input_path=None,
            output_path=output_path,
            n_clusters=n_clusters,
            cache_path=self.cache_path,
            id_field=id_field,
            embedding_field=embedding_field,
            which_to_keep=which_to_keep,
            distance_metric=distance_metric,
            ranking_strategy=ranking_strategy,
            random_state=kmeans_random_state,
            eps=eps,
        )

    def _write_output(self, df: DataFrame, path: str) -> None:
        if self.output_fields:
            df = df.select(*self.output_fields)
        if self.output_filetype == "jsonl":
            df.write.mode("overwrite").json(path)
        else:
            df.write.mode("overwrite").parquet(path)

    def run(
        self, spark: SparkSession, input_df: DataFrame | None = None
    ) -> WorkflowRunResult:
        result = WorkflowRunResult(
            workflow_name="text_semantic_deduplication"
        )
        total_start = time.time()
        df = _resolve_input(self, spark, input_df)
        if self.use_id_generator:
            gen_path = self.id_generator_state_file or os.path.join(
                self.output_path, "semantic_id_generator.json"
            )
            df, assigned = _assign_ids(df, gen_path, self.text_field)
            if assigned != self.id_field:
                df = df.withColumnRenamed(assigned, self.id_field)
            result.add_metadata("id_generator_path", gen_path)

        # Phase 1: embeddings (persisted — the reference's resume seam)
        t0 = time.time()
        from nemo_curator_spark.operators.classifiers import EmbedderStage

        embedder = self.embedder or EmbedderStage(
            out_col=self.embedding_field
        )
        # embedding_max_chars bounds the MODEL INPUT only (reference
        # semantics) — the dataset text is never mutated
        if self.embedding_max_chars:
            embed_in = df.withColumn(
                "_embed_text",
                F.substring(
                    F.col(self.text_field), 1, self.embedding_max_chars
                ),
            )
            embedded = embedder.apply(embed_in, text_col="_embed_text").drop(
                "_embed_text"
            )
        else:
            embedded = embedder.apply(df, text_col=self.text_field)
        emb_path = os.path.join(self.cache_path, "Embeddings")
        embedded.write.mode("overwrite").parquet(emb_path)
        result.add_metadata("embedding_time", time.time() - t0)
        embedded = spark.read.parquet(emb_path)

        # Phase 2: semantic dedup (scores + ids via the inner workflow)
        inner = self._inner.run(spark, input_df=embedded)
        result.pipeline_tasks.update(inner.pipeline_tasks)
        for k in (
            "pairwise_time",
            "pairwise_scores_path",
            "identify_time",
            "num_duplicates",
            "duplicate_ids_path",
        ):
            result.add_metadata(k, inner.get_metadata(k))

        # Phase 3: removal (this workflow DOES implement it)
        if self.perform_removal:
            t0 = time.time()
            removal_ids = spark.read.parquet(
                inner.get_metadata("duplicate_ids_path")
            )
            kept = DD.remove_duplicates(
                embedded.drop(self.embedding_field),
                removal_ids,
                id_col=self.id_field,
            )
            out_path = os.path.join(self.output_path, "deduplicated")
            self._write_output(kept, out_path)
            result.add_metadata("removal_time", time.time() - t0)
            result.add_metadata("deduplicated_path", out_path)
        result.add_metadata("total_time", time.time() - total_start)
        return result
