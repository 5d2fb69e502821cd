"""Batched model inference over text columns — the step that PRODUCES
the ``embeddings`` every similarity/semdedup consumer in this repo
assumes already exists.

The reference has no inference surface (its closest analog is applying
an arbitrary per-message Python function — reference
metalpipe/node.py:976 ``FunctionOfMessage``); this family is the
training-data-pipeline extension: a real corpus pipeline is
``documents → embed → semdedup/ANN``, and at 100 TB the embed stage is
usually the dominant cost, so its Spark shape matters:

* **mapInPandas, Arrow-batched** — text ships to Python in columnar
  batches (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
  them), never row-at-a-time;
* **executor-side model loading** — the model loads ONCE per Python
  worker process (module-level cache) and is reused across tasks while
  ``spark.python.worker.reuse`` (default true) keeps the worker alive.
  Weights never ride the closure, so a 1000-executor fan-out ships the
  model *spec* (a string), not the model;
* **batch-size knob** — Arrow batches are re-chunked to the model's
  preferred batch size before each ``encode`` call (GPU-sized batches
  are usually smaller than Arrow's 10k default);
* **max-concurrent knob** — a worker-process-level semaphore bounds
  concurrent ``encode`` calls.  Scope: one Python worker process (Spark
  runs one worker per core by default, so cluster-wide concurrency is
  ``executors × cores``; bound THAT with ``spark.executor.cores`` /
  dynamic allocation — a UDF cannot see across processes, and
  pretending otherwise would be a lie that only shows up on a real
  cluster).

Real neural encoders (torch/ONNX) are not in this container, so the
shipped model is the deterministic **hashed-projection fixture**:
feature hashing of whitespace tokens into ``dim`` signed buckets,
L2-normalized.  Every arithmetic step is exact-integer until one final
``int / sqrt(int)`` per dimension, so the output is bit-identical in
any engine — which is what lets the driver's DuckDB oracle hash-gate
the whole mapInPandas path end-to-end (``q_embed_documents``).  Loaders
for real models plug in via :func:`register_embedding_model` without
touching the Spark plumbing.
"""

from __future__ import annotations

import hashlib
import re
import threading
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

# The pinned whitespace class, spelled out: identical to Python
# re.ASCII '\s' AND Java '\s' (both [ \t\n\x0b\f\r]); the SQL oracles
# use the same explicit class because RE2's '\s' EXCLUDES \x0b (r14
# advisor finding) and a Unicode-aware '\s' would also split NBSP —
# either would break the bit-identical-replay contract.
_TOKEN_SPLIT = re.compile(r"[ \t\n\x0b\f\r]+")

# One entry per (worker process, model spec): the executor-side model
# cache.  Populated lazily inside the UDF, so the driver never loads
# (or ships) weights.
_MODEL_CACHE: dict[str, object] = {}
_CACHE_LOCK = threading.Lock()
_ENCODE_GATES: dict[int, threading.Semaphore] = {}

# Plugin registry: name -> loader(spec_args: str) -> model.  A model is
# any object with `.dim: int` and `.encode(list[str]) -> ndarray`.
_LOADERS: dict[str, Callable[[str], object]] = {}


def register_embedding_model(name: str, loader: Callable[[str], object]) -> None:
    """Register a loader for ``model="{name}:{args}"`` specs.  The
    loader runs on the EXECUTOR (inside the UDF, cached per worker
    process) — it may read weight files from shared storage, but the
    driver-side plan only ever carries the spec string."""
    _LOADERS[name] = loader


def _hashed_token_counts(texts: list, dim: int, salt: str):
    """Signed hashed bag-of-tokens features for a text batch —
    ``(len(texts), dim)`` int64 — the shared featurizer of the fixture
    and numpy-MLP encoders.  One md5 per token; bucket = first 15
    nibbles mod ``dim``, sign = 16th nibble's parity (the repo-wide
    portable convention, operators/dedup.py ``_hash64``)."""
    import numpy as np

    counts = np.zeros((len(texts), dim), dtype=np.int64)
    for i, text in enumerate(texts):
        if text is None:
            continue
        for tok in _TOKEN_SPLIT.split(str(text).lower()):
            if not tok:
                continue
            h = hashlib.md5((salt + tok).encode("utf-8")).hexdigest()
            bucket = int(h[:15], 16) % dim
            counts[i, bucket] += 1 if int(h[15], 16) % 2 == 0 else -1
    return counts


class HashedProjectionModel:
    """Deterministic fixture encoder: feature hashing (Weinberger et
    al. 2009's hashing trick) of lower-cased whitespace tokens into
    ``dim`` signed buckets, L2-normalized.

    Hash convention is the repo-wide portable one (operators/dedup.py
    ``_hash64``): bucket = first 15 md5 nibbles as int, mod dim; sign =
    16th nibble's parity — one md5 per token, replayable as
    ``('0x' || substr(md5(tok), 1, 15))::BIGINT`` in any SQL engine.
    Accumulation is exact integer; the only float ops are one sqrt and
    one divide per dimension, bit-identical everywhere.  ``salt`` gives
    independent models (it prefixes every token before hashing)."""

    def __init__(self, dim: int, salt: str = ""):
        if dim < 1:
            raise ValueError(f"dim must be >= 1, got {dim}")
        self.dim = dim
        self.salt = salt

    def encode(self, texts: list) -> "object":
        import numpy as np

        counts = _hashed_token_counts(texts, self.dim, self.salt)
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        # norm² is an exact int; int/sqrt(int) is one rounding per
        # dim — the bit-reproducibility contract.
        n2 = (counts * counts).sum(axis=1)
        nz = n2 > 0
        out[nz] = counts[nz] / np.sqrt(n2[nz].astype(np.float64))[:, None]
        return out


def _hashed_projection_loader(args: str) -> HashedProjectionModel:
    parts = args.split(":", 1) if args else [""]
    if not parts[0].isdigit():
        raise ValueError(
            "hashed-projection spec is 'hashed-projection:{dim}[:{salt}]',"
            f" got args {args!r}"
        )
    return HashedProjectionModel(
        int(parts[0]), salt=parts[1] if len(parts) > 1 else ""
    )


register_embedding_model("hashed-projection", _hashed_projection_loader)


def _det_weights(rows: int, cols: int, tag: str):
    """Deterministic float64 weight matrix in [-1, 1) / sqrt(cols)
    (fan-in scaling), derived from splitmix64 over the flat index —
    integer arithmetic end-to-end, so the same spec string yields
    bit-identical weights on every worker, every platform, no RNG
    state to ship."""
    import numpy as np

    seed = int(hashlib.md5(tag.encode("utf-8")).hexdigest()[:15], 16)
    z = np.arange(rows * cols, dtype=np.uint64) + np.uint64(seed)
    with np.errstate(over="ignore"):  # wrapping IS the mixer
        z = (z + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z ^= z >> np.uint64(30)
        z = (z * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z ^= z >> np.uint64(27)
        z = (z * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z ^= z >> np.uint64(31)
    u = (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)  # [0,1)
    return ((u * 2.0 - 1.0) / float(cols) ** 0.5).reshape(rows, cols)


class NumpyMLPModel:
    """A REAL (if small) neural encoder with zero dependencies beyond
    numpy — proves the :func:`embed_documents` plumbing (worker-process
    weight cache, re-chunking, the concurrency gate) with a model that
    actually owns weight tensors, which the hashed-projection fixture
    does not (VERDICT r14 task 4; torch/ONNX are absent from the
    container, so this is the heaviest encoder the sandbox can run).

    Architecture: hashed bag-of-tokens features (``dim_in`` signed
    buckets, the shared :func:`_hashed_token_counts` featurizer) →
    ``tanh(x W1 + b1)`` → ``h W2 + b2`` → L2 normalize.  Weights come
    from :func:`_det_weights` — deterministic in the spec string, so
    every worker materializes identical tensors and outputs are
    reproducible run-to-run (the fixture-model property, kept).

    The two matmuls run through :func:`_det_matmul`, a fixed
    left-to-right fold over the contraction axis, NOT BLAS ``@``:
    GEMM kernels choose blocking (and therefore summation order) by
    batch shape, thread count and microarchitecture, so ``x @ w`` can
    differ in the last ulp between a 1-row driver-side encode and a
    7-row worker batch — breaking the worker == driver bit-equality
    this fixture model promises (observed on this host: OpenBLAS GEMV
    vs GEMM paths disagree by 1 ulp).  The fold's order depends only
    on the contraction length, which is fixed by the spec."""

    def __init__(self, dim_in: int, hidden: int, dim_out: int,
                 salt: str = ""):
        for nm, v in (("dim_in", dim_in), ("hidden", hidden),
                      ("dim_out", dim_out)):
            if v < 1:
                raise ValueError(f"{nm} must be >= 1, got {v}")
        self.dim_in, self.dim = dim_in, dim_out
        self.salt = salt
        tag = f"numpy-mlp:{dim_in}:{hidden}:{dim_out}:{salt}"
        self.w1 = _det_weights(dim_in, hidden, tag + ":w1")
        self.b1 = _det_weights(1, hidden, tag + ":b1")[0]
        self.w2 = _det_weights(hidden, dim_out, tag + ":w2")
        self.b2 = _det_weights(1, dim_out, tag + ":b2")[0]

    @staticmethod
    def _det_matmul(x, w):
        """Batch-shape-independent matmul: out[i, j] = the strict
        left-to-right IEEE fold of x[i, k] * w[k, j] over k.  Each
        output element's summation order is a function of the
        contraction length alone, so results are bit-identical for any
        batch size, thread count or BLAS build."""
        import numpy as np

        out = np.zeros((x.shape[0], w.shape[1]), dtype=np.float64)
        for k in range(x.shape[1]):
            out += x[:, k : k + 1] * w[k]
        return out

    def encode(self, texts: list) -> "object":
        import numpy as np

        x = _hashed_token_counts(texts, self.dim_in, self.salt).astype(
            np.float64
        )
        h = np.tanh(self._det_matmul(x, self.w1) + self.b1)
        y = self._det_matmul(h, self.w2) + self.b2
        n = np.sqrt((y * y).sum(axis=1))
        nz = n > 0
        y[nz] = y[nz] / n[nz][:, None]
        y[~nz] = 0.0
        return y


def _numpy_mlp_loader(args: str) -> NumpyMLPModel:
    parts = args.split(":", 3)
    if len(parts) < 3 or not all(p.isdigit() for p in parts[:3]):
        raise ValueError(
            "numpy-mlp spec is 'numpy-mlp:{dim_in}:{hidden}:{dim_out}"
            f"[:{{salt}}]', got args {args!r}"
        )
    return NumpyMLPModel(
        int(parts[0]), int(parts[1]), int(parts[2]),
        salt=parts[3] if len(parts) > 3 else "",
    )


register_embedding_model("numpy-mlp", _numpy_mlp_loader)


def _require(module: str, spec_name: str):
    """Import an optional heavyweight dependency or fail LOUD with the
    activation path (r16 verdict task 5: the environment block is the
    only thing between this repo and real encoders — when a deployment
    has the wheel, zero code changes are needed)."""
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError as e:
        raise ImportError(
            f"the {spec_name!r} embedding model needs the optional "
            f"dependency {module!r}, which is not installed in this "
            f"environment.  Activation: install it on driver AND "
            f"executors (e.g. pip install {module}; on a cluster, bake "
            "it into the executor image or ship it via "
            "spark.archives/conda-pack), then re-run — the loader, "
            "mapInPandas plumbing, worker-process weight cache and "
            "batch re-chunking are already wired.  Original error: "
            f"{e}"
        ) from e


def _load_hf_tokenizer(path: str, max_len: int):
    """A ``tokenizers.Tokenizer`` from a ``tokenizer.json`` file,
    configured for fixed-shape padded/truncated batch encoding."""
    tokenizers = _require("tokenizers", "onnx/torchscript")
    tok = tokenizers.Tokenizer.from_file(path)
    tok.enable_truncation(max_length=max_len)
    tok.enable_padding(length=max_len)
    return tok


def _pool_and_normalize(hidden, mask):
    """Masked mean-pool over the sequence axis + L2 normalize — the
    sentence-transformers output convention, shared by the ONNX and
    TorchScript encoders so a swapped runtime cannot drift the
    embedding contract."""
    import numpy as np

    hidden = np.asarray(hidden, dtype=np.float64)
    m = np.asarray(mask, dtype=np.float64)[:, :, None]
    summed = (hidden * m).sum(axis=1)
    denom = np.maximum(m.sum(axis=1), 1e-9)
    y = summed / denom
    n = np.sqrt((y * y).sum(axis=1))
    nz = n > 0
    y[nz] = y[nz] / n[nz][:, None]
    y[~nz] = 0.0
    return y


class OnnxEncoderModel:
    """A REAL transformer encoder via onnxruntime — spec
    ``onnx:{model.onnx}:{tokenizer.json}[:{max_len}]``.  Loads the
    session and HuggingFace ``tokenizers`` tokenizer once per worker
    process (the :func:`load_model` cache); ``encode`` tokenizes the
    batch to fixed-shape ``input_ids``/``attention_mask`` int64
    tensors, runs the session, masked-mean-pools the last hidden
    state and L2-normalizes (the sentence-transformers convention).
    ``dim`` reads from the session's output metadata at load, so the
    Spark-side schema/partitioning plumbing needs nothing model-
    specific.  Both ``onnxruntime`` and ``tokenizers`` are OPTIONAL
    imports that fail loud with the activation path — deliberately
    not a silent stub."""

    def __init__(self, model_path: str, tokenizer_path: str,
                 max_len: int = 256):
        ort = _require("onnxruntime", "onnx")
        self.session = ort.InferenceSession(
            model_path, providers=["CPUExecutionProvider"]
        )
        self.tokenizer = _load_hf_tokenizer(tokenizer_path, max_len)
        self.max_len = max_len
        self.input_names = {i.name for i in self.session.get_inputs()}
        out0 = self.session.get_outputs()[0]
        self.dim = int(out0.shape[-1])

    def encode(self, texts: list) -> "object":
        import numpy as np

        enc = self.tokenizer.encode_batch(
            ["" if t is None else str(t) for t in texts]
        )
        ids = np.asarray([e.ids for e in enc], dtype=np.int64)
        mask = np.asarray([e.attention_mask for e in enc], dtype=np.int64)
        feeds = {"input_ids": ids, "attention_mask": mask}
        if "token_type_ids" in self.input_names:
            feeds["token_type_ids"] = np.zeros_like(ids)
        hidden = self.session.run(None, feeds)[0]
        return _pool_and_normalize(hidden, mask)


def _onnx_loader(args: str) -> OnnxEncoderModel:
    parts = args.split(":")
    if len(parts) < 2:
        raise ValueError(
            "onnx spec is 'onnx:{model.onnx}:{tokenizer.json}"
            f"[:{{max_len}}]', got args {args!r}"
        )
    max_len = int(parts[2]) if len(parts) > 2 and parts[2] else 256
    return OnnxEncoderModel(parts[0], parts[1], max_len=max_len)


register_embedding_model("onnx", _onnx_loader)


class TorchScriptEncoderModel:
    """A REAL transformer encoder via TorchScript — spec
    ``torchscript:{model.pt}:{tokenizer.json}[:{max_len}][:{device}]``.
    ``torch.jit.load`` needs no model class code, so the worker ships
    only the spec string and reads weights from shared storage; the
    module is called as ``module(input_ids, attention_mask)`` and its
    first output is masked-mean-pooled + L2-normalized exactly like
    the ONNX twin.  ``dim`` probes one empty-string forward pass at
    load (cheap, and it validates the artifact before a 1000-task
    fan-out does).  ``torch`` and ``tokenizers`` are OPTIONAL imports
    that fail loud with the activation path."""

    def __init__(self, model_path: str, tokenizer_path: str,
                 max_len: int = 256, device: str = "cpu"):
        torch = _require("torch", "torchscript")
        self._torch = torch
        self.device = device
        self.module = torch.jit.load(model_path, map_location=device)
        self.module.eval()
        self.tokenizer = _load_hf_tokenizer(tokenizer_path, max_len)
        self.max_len = max_len
        self.dim = int(self._forward([""])[0].shape[-1])

    def _forward(self, texts: list):
        torch = self._torch
        enc = self.tokenizer.encode_batch(
            ["" if t is None else str(t) for t in texts]
        )
        ids = torch.tensor(
            [e.ids for e in enc], dtype=torch.long, device=self.device
        )
        mask = torch.tensor(
            [e.attention_mask for e in enc],
            dtype=torch.long,
            device=self.device,
        )
        with torch.no_grad():
            out = self.module(ids, mask)
        hidden = out[0] if isinstance(out, (tuple, list)) else out
        return hidden.cpu().numpy(), mask.cpu().numpy()

    def encode(self, texts: list) -> "object":
        hidden, mask = self._forward(texts)
        return _pool_and_normalize(hidden, mask)


def _torchscript_loader(args: str) -> TorchScriptEncoderModel:
    parts = args.split(":")
    if len(parts) < 2:
        raise ValueError(
            "torchscript spec is 'torchscript:{model.pt}:"
            "{tokenizer.json}[:{max_len}][:{device}]', got args "
            f"{args!r}"
        )
    max_len = int(parts[2]) if len(parts) > 2 and parts[2] else 256
    device = parts[3] if len(parts) > 3 and parts[3] else "cpu"
    return TorchScriptEncoderModel(
        parts[0], parts[1], max_len=max_len, device=device
    )


register_embedding_model("torchscript", _torchscript_loader)


def _encode_gate(n: int) -> threading.Semaphore:
    """Worker-process-level semaphore for ``max_concurrent`` (one per
    bound value).  A module function rather than inline closure code:
    cloudpickle captures a closure's referenced globals BY VALUE, and a
    lock in the capture set would make the UDF unpicklable — referenced
    module-level *functions* pickle by name instead."""
    with _CACHE_LOCK:
        return _ENCODE_GATES.setdefault(n, threading.Semaphore(n))


def load_model(spec: str, loader: Callable[[str], object] | None = None):
    """Resolve a model spec to a cached model instance (executor side).
    Unknown names fail loud with the plug-in instructions — real neural
    encoders (torch/ONNX) are deliberately NOT stubbed as silent
    no-ops.

    ``loader`` overrides the registry lookup: plugin loaders registered
    on the DRIVER don't exist in executor worker processes (each is a
    fresh import of this module), so :func:`embed_documents` resolves
    the loader at plan time and ships it inside the UDF closure."""
    with _CACHE_LOCK:
        model = _MODEL_CACHE.get(spec)
        if model is None:
            name, _, args = spec.partition(":")
            loader = loader if loader is not None else _LOADERS.get(name)
            if loader is None:
                raise NotImplementedError(
                    f"no embedding model loader named {name!r} (spec"
                    f" {spec!r}); built-in: 'hashed-projection:{{dim}}'"
                    " — register real encoders with"
                    " register_embedding_model(name, loader)"
                )
            model = loader(args)
            _MODEL_CACHE[spec] = model
    return model


def embed_documents(
    df: DataFrame,
    text_col: str = "text",
    model: str = "hashed-projection:64",
    output_col: str = "embedding",
    batch_size: int = 256,
    max_concurrent: int | None = None,
) -> DataFrame:
    """Append ``output_col`` (``array<double>``) = ``model(text_col)``,
    batch-inferred executor-side.  All input columns pass through.

    ``batch_size`` re-chunks each Arrow batch before ``encode`` (sized
    to the model, not to Arrow); ``max_concurrent`` bounds concurrent
    ``encode`` calls *within one Python worker process* (see module
    docstring for the cluster-wide story).  Plan shape: one narrow
    ArrowEvalPython-style stage — no shuffle, no collect, scales with
    input splits."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if max_concurrent is not None and max_concurrent < 1:
        raise ValueError(
            f"max_concurrent must be >= 1, got {max_concurrent}"
        )
    if text_col not in df.columns:
        raise ValueError(f"no column {text_col!r} in {df.columns}")
    if output_col in df.columns:
        raise ValueError(f"output_col {output_col!r} already exists")
    # Validate the spec NOW on the driver (fail at plan time, not as a
    # per-task executor error storm) — fixture loaders are cheap; a
    # heavyweight loader can make its driver-side validation cheap by
    # deferring the weight read to first encode().
    load_model(model)
    # Ship the resolved loader in the closure: executor worker processes
    # import this module fresh, so driver-side register_embedding_model
    # calls are invisible there — only the closure crosses the wire.
    shipped_loader = _LOADERS[model.partition(":")[0]]

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(output_col, ArrayType(DoubleType()), True)]
    )
    spec, tcol, bsz, gate_n = model, text_col, batch_size, max_concurrent

    def infer(batches: Iterator) -> Iterator:
        m = load_model(spec, shipped_loader)  # per-worker-process cache
        gate = _encode_gate(gate_n) if gate_n is not None else None
        for pdf in batches:
            texts = pdf[tcol].tolist()
            vecs: list = []
            for at in range(0, len(texts), bsz):
                chunk = texts[at : at + bsz]
                if gate is not None:
                    with gate:
                        enc = m.encode(chunk)
                else:
                    enc = m.encode(chunk)
                vecs.extend(list(map(list, enc)))
            out = pdf.copy()
            out[output_col] = vecs
            yield out

    return df.mapInPandas(infer, out_schema)


def incremental_embed(
    new_docs: DataFrame,
    store: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    model: str = "hashed-projection:64",
    output_col: str = "embedding",
    batch_size: int = 256,
    max_concurrent: int | None = None,
) -> "tuple[DataFrame, DataFrame]":
    """Embed ONLY what changed — the incremental twin of
    :func:`embed_documents`, completing the exact/MinHash/embedding/
    image incremental-store family (operators/dedup.py,
    operators/similarity.py) for the inference stage.

    The store is ``(id, fingerprint, embedding, model)`` — fingerprint
    is the portable md5 of the text, so an unchanged document is
    recognized WITHOUT re-running the model, and a re-crawled document
    whose text changed re-embeds (an id-only anti-join would serve
    stale embeddings forever).  ``model`` rides with every store row
    (the band_store/bloom ``h``-marker rule): a store embedded with one
    model must never silently mix with a batch embedded by another —
    mixed markers fail loud.

    Returns ``(fresh, updated_store)``: ``fresh`` is the newly-embedded
    rows only (what downstream incremental consumers — cell stores,
    ANN indexes — need to ingest), ``updated_store`` carries every
    current batch id with its up-to-date embedding (carried rows
    untouched, changed/new rows replaced).

    Plan shape: one (id, fingerprint) equi-join against the store
    decides the re-embed set — bucket the store on ``id_col`` and the
    join co-locates (SCALING.md batch 8) — and the model runs over the
    CHANGED SLIVER only.  At 100 TB with a ~1%/day churn corpus this is
    the difference between 1 TB/day and 100 TB/day of inference.

    The store is read three times (model-marker check, carried join,
    anti-join): pass it as a STORED table (parquet/bucketed — the
    band_store rule) or persist it first; an unpersisted store whose
    lineage contains inference would re-run that inference per read."""
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    batch = new_docs.withColumn("__fp", fp)
    if store is not None:
        required = {id_col, "__fp", output_col, "__model"}
        missing = required - set(store.columns)
        if missing:
            raise ValueError(
                f"incremental_embed: store is missing columns {sorted(missing)}"
                " (expected a store produced by incremental_embed)"
            )
        markers = sorted(
            r["__model"] if r["__model"] is not None else "<null>"
            for r in store.select("__model").distinct().collect()
        )
        if any(m != model for m in markers):
            raise ValueError(
                f"incremental_embed: store carries model markers {markers}"
                f" but the batch uses {model!r} — embeddings from"
                " different models must never mix; rebuild one side"
            )
        carried = (
            batch.join(store, [id_col, "__fp"], "inner")
            .select(batch["*"], F.col(output_col))
        )
        todo = batch.join(store, [id_col, "__fp"], "left_anti")
    else:
        carried = None
        todo = batch
    fresh = embed_documents(
        todo,
        text_col=text_col,
        model=model,
        output_col=output_col,
        batch_size=batch_size,
        max_concurrent=max_concurrent,
    )
    # The model execution feeds BOTH returned frames (fresh for
    # downstream ingest, updated_store via the union) — a caller
    # consuming both would run inference on the changed sliver once per
    # action (r17; guide §4: the Python-kernel boundary is the
    # expensive stage, never price it twice).  Lazy localCheckpoint:
    # sliver-scale (id, fp, embedding) rows, materialized by whichever
    # action runs first, blocks dropped by the ContextCleaner.
    fresh = fresh.localCheckpoint(eager=False)
    updated = fresh if carried is None else fresh.unionByName(carried)
    updated_store = updated.select(
        id_col, "__fp", output_col, F.lit(model).alias("__model")
    )
    return fresh.drop("__fp"), updated_store
