"""End-to-end KG pipeline with per-stage checkpoints and resume.

Stage DAG (each stage writes a parquet table under ``workdir`` — the local stand-in for
the per-stage Iceberg checkpoint tables of the north-star spec; a completed stage is
detected by its ``_SUCCESS`` marker and skipped on resume):

    docs → sentences → tagged → triples_raw → links → canonical_map → nodes/edges + metrics

Shuffle budget (SURVEY.md §4.2): docs→triples_raw is entirely narrow (mapInPandas
chain); the only shuffles are the mention dedup groupBy, the canonicalization
iterations, and the final bucketed writes. The alias dictionary and link table ride as
broadcasts.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fixtures.corpus import gazetteer_from_aliases, make_aliases
from .operators import canonicalize, graph, linking
from .operators.docsgen import generate_docs
from .operators.schemas import ALIASES_SCHEMA
from .operators.tag import tag_sentences_lexicon
from .operators.tokenize import media_spans, tokenize_docs
from .operators.triples import docs_to_triples_fused, extract_triples_df
from .operators.writer import ParquetTableWriter


@dataclass
class KgPipeline:
    spark: SparkSession
    workdir: str
    n_docs: int = 10_000
    seed: int = 42
    n_buckets: int = 32
    fused: bool = True
    tagger: str = "lexicon"  # or "dnn": BiLSTM POS+NER models drive the staged path
    # (north_star: "the DNN tagger ... over the text spans"; forces fused=False)
    dnn_models: tuple | None = None  # (pos_model, ner_model) tagger models; default =
    # the TRAINED demo pair (model/demo.py — reproduces the lexicon regimen, so the
    # graph stages carry real volume; the pinned random pair would emit zero triples).
    # Load real production models via sources.s2s.load_tagger
    dnn_backend: str = "numpy"  # or "onnx": export via model/onnx_export, broadcast the
    # ONNX bundle, run one session per executor (numpy_session_factory here;
    # onnxruntime on a production image) — the north-star deployment shape executed
    dnn_dedup_sentences: bool = True  # corpus-global duplicate-sentence dedup around
    # the DNN decode (tag_sentences_bilstm_dedup) — result-identical (deterministic,
    # batch-invariant decode), decode cost scales with DISTINCT sentences
    link_strategy: str = "broadcast"  # or "salted" when the alias dim exceeds broadcast budget
    link_fuzzy: bool = False  # second-pass stem-block linking for inflected mentions
    durable_cc: bool = False  # CC iteration state to reliable storage (cluster runs);
    # local-mode default stays localCheckpoint — see canonicalize.connected_components
    docs_df: DataFrame | None = None  # override the generated corpus with a real table
    docs_fingerprint: str | None = None  # identifier of the EXTERNAL corpus for the
    # resume guard (snapshot id / path / content digest). The schema is always
    # fingerprinted; the content identity of a DataFrame can't be, so pass this when
    # resuming over workdirs built from different external corpora must be caught.
    writer: object | None = None  # TableWriter; default ParquetTableWriter(workdir) —
    # pass IcebergTableWriter(spark, catalog) on a lake (operators/writer.py)
    timings: dict[str, float] = field(default_factory=dict)

    def path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _writer(self):
        if self.writer is None:
            self.writer = ParquetTableWriter(self.workdir)
        return self.writer

    def _read(self, stage: str) -> DataFrame:
        return self._writer().read(self.spark, stage)

    def _run_stage(self, stage: str, build, resume: bool,
                   bucket_col: str | None = None) -> DataFrame:
        w = self._writer()
        if resume and w.done(self.spark, stage):
            return w.read(self.spark, stage)
        t0 = time.time()
        w.write(build(), stage, bucket_col=bucket_col, n_buckets=self.n_buckets)
        self.timings[stage] = round(time.time() - t0, 3)
        return w.read(self.spark, stage)

    # --- broadcast side data (alias rows computed once per pipeline object) ---
    def _alias_rows(self) -> list:
        rows = getattr(self, "_alias_rows_cache", None)
        if rows is None:
            rows = make_aliases(seed=self.seed)
            self._alias_rows_cache = rows
        return rows

    def aliases_df(self) -> DataFrame:
        import pandas as pd

        # pandas → Arrow path is ~5× faster than row-by-row list conversion
        return self.spark.createDataFrame(pd.DataFrame(self._alias_rows()),
                                          schema=ALIASES_SCHEMA)

    def gazetteer_bc(self):
        """One broadcast per pipeline object, built LAZILY at the first consuming
        stage — a fully-resumed run (and the dnn path, whose tagged stage never
        reads it) skips the dictionary build + broadcast entirely."""
        bc = getattr(self, "_gaz_bc_cache", None)
        if bc is None:
            bc = self.spark.sparkContext.broadcast(
                gazetteer_from_aliases(self._alias_rows()))
            self._gaz_bc_cache = bc
        return bc

    # defaults for fingerprint keys added after a workdir was built: a missing key in
    # an old config.json means "built with the default", so resume stays compatible
    # dnn_dedup legacy default is True even though old workdirs ran WITHOUT dedup:
    # the dedup is result-identical (pinned in tests), so trusting a pre-upgrade
    # tagged stage is correct — mapping the missing key to False would needlessly
    # invalidate every pre-upgrade workdir (including pure-lexicon ones)
    _FP_DEFAULTS = {"tagger": "lexicon", "dnn_backend": "numpy",
                    "dnn_models": "pinned", "dnn_dedup": True}

    def _config_fingerprint(self) -> dict:
        if self.dnn_models is None:
            # the default demo pair is itself versioned — a retrained artifact must
            # invalidate resumed 'tagged' stages exactly like different weights
            from .model.demo import DEMO_VERSION

            models_fp = f"demo-v{DEMO_VERSION}"
        else:
            import hashlib

            # digest of the actual weights: resuming a 'tagged' stage built with
            # DIFFERENT models must fail the guard, not silently reuse it
            h = hashlib.sha1()
            for m in self.dnn_models:
                h.update(m.to_bytes())
            models_fp = h.hexdigest()[:16]
        if self.docs_df is None:
            docs_fp = False
        else:
            # content identity of a DataFrame is not derivable without an action, so
            # the guard uses the schema plus the caller-supplied docs_fingerprint;
            # without one, two different external corpora with the same schema are
            # indistinguishable to resume (documented at the field)
            docs_fp = [self.docs_df.schema.json(), self.docs_fingerprint]
        return {"n_docs": self.n_docs, "seed": self.seed, "n_buckets": self.n_buckets,
                "fused": self.fused, "tagger": self.tagger,
                "dnn_backend": self.dnn_backend, "dnn_models": models_fp,
                "dnn_dedup": self.dnn_dedup_sentences,
                "link_strategy": self.link_strategy,
                "link_fuzzy": self.link_fuzzy, "external_docs": docs_fp}

    def _dnn_tagged(self, sentences: DataFrame) -> DataFrame:
        """The DNN regimen inside the pipeline: broadcast the two tagger models
        (NumPy bytes, or real exported ONNX bundles when dnn_backend='onnx') and run
        tag_sentences_bilstm — the north-star shape 'DNN tagger (BiLSTM ... ONNX-
        exported weights broadcast to executors) over the text spans'."""
        from .model.backend import onnx_backend
        from .model.demo import demo_tagger_models
        from .operators.tag import tag_sentences_bilstm, tag_sentences_bilstm_dedup

        tag_op = (tag_sentences_bilstm_dedup if self.dnn_dedup_sentences
                  else tag_sentences_bilstm)
        pos_m, ner_m = self.dnn_models or demo_tagger_models()
        sc = self.spark.sparkContext
        if self.dnn_backend == "onnx":
            from .model.onnx_export import to_onnx_bundle
            from .model.onnx_numpy import numpy_session_factory

            pos_bc = sc.broadcast(to_onnx_bundle(pos_m))
            ner_bc = sc.broadcast(to_onnx_bundle(ner_m))
            loader = onnx_backend(session_factory=numpy_session_factory)
            return tag_op(sentences, pos_bc, ner_bc, backend_loader=loader)
        return tag_op(sentences, sc.broadcast(pos_m.to_bytes()),
                      sc.broadcast(ner_m.to_bytes()))

    # every stage _run_stage can write — the invalidation set for a config change
    STAGES = ("docs", "media_spans", "sentences", "tagged", "triples_raw", "links",
              "canonical_map", "linked_triples", "nodes", "edges", "metrics")

    def _check_fingerprint(self, resume: bool) -> None:
        """Resume keys on _SUCCESS markers; guard against silently reusing stages
        built with a DIFFERENT config over the same workdir. When a resume=False run
        CHANGES the config, every existing stage marker is invalidated FIRST: the new
        config.json lands before the rebuild starts, so a crash partway through must
        not leave old-config stages that a later resume=True would trust."""
        fp_path = os.path.join(self.workdir, "config.json")
        fp = self._config_fingerprint()
        if os.path.exists(fp_path):
            with open(fp_path) as f:
                old = json.load(f)
            old = {**self._FP_DEFAULTS, **old}  # pre-upgrade workdirs lack new keys
            if old != fp:
                if resume:
                    raise ValueError(
                        f"workdir {self.workdir} holds stages built with a different "
                        f"config ({old} != {fp}); run with resume=False or a fresh "
                        "workdir"
                    )
                w = self._writer()
                for stage in self.STAGES:
                    w.invalidate(self.spark, stage)
        os.makedirs(self.workdir, exist_ok=True)
        with open(fp_path, "w") as f:
            json.dump(fp, f)

    # --- stages ---
    def run(self, resume: bool = True) -> dict[str, int]:
        spark = self.spark
        if self.tagger not in ("lexicon", "dnn"):
            raise ValueError(f"tagger must be 'lexicon' or 'dnn', got {self.tagger!r}")
        if self.dnn_backend not in ("numpy", "onnx"):
            raise ValueError(
                f"dnn_backend must be 'numpy' or 'onnx', got {self.dnn_backend!r}")
        if self.tagger == "dnn" and self.fused:
            # the fused single-pass operator is lexicon-only; the DNN regimen runs
            # the staged path (its model batching wants whole Arrow batches anyway).
            # Normalized BEFORE the fingerprint so resume sees the effective config.
            self.fused = False
        self._check_fingerprint(resume)

        docs = self._run_stage(
            "docs",
            lambda: self.docs_df if self.docs_df is not None
            else generate_docs(spark, self.n_docs, self.seed),
            resume,
        )

        media = self._run_stage("media_spans", lambda: media_spans(docs), resume)

        if self.fused:
            triples = self._run_stage(
                "triples_raw",
                lambda: docs_to_triples_fused(docs, self.gazetteer_bc()), resume
            )
        else:
            sentences = self._run_stage("sentences", lambda: tokenize_docs(docs), resume)
            if self.tagger == "dnn":
                tagged = self._run_stage("tagged", lambda: self._dnn_tagged(sentences),
                                         resume)
            else:
                tagged = self._run_stage(
                    "tagged",
                    lambda: tag_sentences_lexicon(sentences, self.gazetteer_bc()),
                    resume
                )
            triples = self._run_stage("triples_raw", lambda: extract_triples_df(tagged), resume)

        def build_links():
            aliases = self.aliases_df()
            mentions = linking.mentions_from_triples(triples)
            if self.link_fuzzy:
                return linking.link_mentions_fuzzy(mentions, aliases)
            return linking.link_mentions(mentions, aliases, strategy=self.link_strategy)

        links = self._run_stage("links", build_links, resume)
        cc_dir = self.path("cc_checkpoints") if self.durable_cc else None
        canon = self._run_stage(
            "canonical_map",
            lambda: canonicalize.canonical_map(links, checkpoint_dir=cc_dir), resume
        )
        linked_triples = self._run_stage(
            "linked_triples", lambda: linking.link_triples(triples, links), resume
        )
        nodes = self._run_stage(
            "nodes", lambda: graph.build_nodes(canon, self.n_buckets), resume,
            bucket_col="bucket",
        )
        edges = self._run_stage(
            "edges", lambda: graph.build_edges_table(linked_triples, canon, self.n_buckets),
            resume, bucket_col="bucket",
        )
        metrics = self._run_stage(
            "metrics",
            lambda: graph.partition_metrics(nodes, "nodes").unionByName(
                graph.partition_metrics(edges, "edges")
            ),
            resume,
        )

        # one job for the whole summary (a union of per-stage counts) instead of
        # 8 sequential .count() actions / driver round-trips
        from functools import reduce

        stage_frames = {
            "docs": docs, "media_spans": media, "triples_raw": triples,
            "links": links, "canonical_map": canon, "nodes": nodes,
            "edges": edges, "metrics": metrics,
        }
        counts_df = reduce(
            DataFrame.unionByName,
            [
                df.agg(F.count(F.lit(1)).alias("n")).select(
                    F.lit(name).alias("stage"), "n")
                for name, df in stage_frames.items()
            ],
        )
        counts = {r["stage"]: r["n"] for r in counts_df.collect()}
        with open(os.path.join(self.workdir, "run_summary.json"), "w") as f:
            json.dump({"counts": counts, "timings": self.timings}, f, indent=2)
        return counts
