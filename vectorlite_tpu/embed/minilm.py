"""On-device MiniLM (BERT) text embedder.

Capability port of the reference's Candle BERT embedder
(reference: src/embeddings.rs:89-277), redesigned for TPU:

* **True batched inference** — the reference embeds one text per rayon task
  (reference: src/embeddings.rs:269-276); here a whole batch rides one jitted
  forward pass, with sequence lengths bucketed to powers of two so the jit
  cache stays small and shapes stay static.
* **CLS pooling, not mean pooling** — the reference takes the final hidden
  state of token (0, 0) and L2-normalizes (reference: src/embeddings.rs:163-181);
  reproduced exactly so similarity scores match.
* **Model loading** — same on-disk layout the reference expects
  (``tokenizer.json`` + ``config.json`` + ``pytorch_model.bin`` /
  ``model.safetensors``, reference: src/embeddings.rs:219-259); dimension is
  read from ``config.hidden_size`` (reference: src/embeddings.rs:244).
* The encoder is pure-JAX over a flat param pytree (no framework layers),
  which keeps HF-weight mapping explicit and lets XLA fuse the whole stack.

Without model files, ``MiniLMEmbedder.random_init()`` builds a
deterministic randomly-initialized encoder — the full compute path without
pretrained weights (the reference hard-fails in that case;
reference: src/embeddings.rs:222-228).
"""

from __future__ import annotations

import json
import math
from functools import partial
from pathlib import Path
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import EmbeddingError

DEFAULT_MODEL_NAME = "all-MiniLM-L6-v2"
DEFAULT_MODEL_PATH = f"./models/{DEFAULT_MODEL_NAME}"

_LEN_BUCKETS = (16, 32, 64, 128, 256, 512)


# --------------------------------------------------------------- the encoder


def _layer_norm(x, w, b, eps=1e-12):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def bert_forward(params: dict, input_ids, attention_mask, config: dict):
    """[B, L] ids -> [B, L, H] final hidden states."""
    h = (
        params["word_emb"][input_ids]
        + params["pos_emb"][None, : input_ids.shape[1]]
        + params["type_emb"][0][None, None, :]
    )
    h = _layer_norm(h, params["emb_ln_w"], params["emb_ln_b"])

    n_heads = config["num_attention_heads"]
    head_dim = config["hidden_size"] // n_heads
    scale = 1.0 / math.sqrt(head_dim)
    # additive mask: 0 for real tokens, -inf for padding
    mask = (1.0 - attention_mask.astype(h.dtype)) * -1e9
    mask = mask[:, None, None, :]  # [B, 1, 1, L]

    for layer in params["layers"]:
        q = h @ layer["q_w"] + layer["q_b"]
        k = h @ layer["k_w"] + layer["k_b"]
        v = h @ layer["v_w"] + layer["v_b"]
        b, l, _ = q.shape
        q = q.reshape(b, l, n_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, n_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, n_heads, head_dim).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, -1)
        attn_out = ctx @ layer["ao_w"] + layer["ao_b"]
        h = _layer_norm(
            h + attn_out, layer["ao_ln_w"], layer["ao_ln_b"]
        )
        ffn = jax.nn.gelu(h @ layer["i_w"] + layer["i_b"], approximate=False)
        ffn = ffn @ layer["o_w"] + layer["o_b"]
        h = _layer_norm(h + ffn, layer["o_ln_w"], layer["o_ln_b"])
    return h


@partial(jax.jit, static_argnames=("config_key",))
def _embed_step(params, input_ids, attention_mask, *, config_key):
    config = dict(config_key)
    hidden = bert_forward(params, input_ids, attention_mask, config)
    cls = hidden[:, 0, :]  # CLS pooling (reference: src/embeddings.rs:165)
    norm = jnp.sqrt(jnp.sum(cls * cls, axis=-1, keepdims=True))
    return jnp.where(norm > 0.0, cls / jnp.maximum(norm, 1e-30), cls)


# ------------------------------------------------------------ weight loading


def _load_torch_weights(model_file: Path) -> dict[str, np.ndarray]:
    if model_file.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(str(model_file))
    import torch

    state = torch.load(
        str(model_file), map_location="cpu", weights_only=True
    )
    return {k: v.numpy() for k, v in state.items()}


def _map_hf_params(state: dict[str, np.ndarray], n_layers: int) -> dict:
    """HF bert-* names -> our flat pytree. torch Linear stores [out, in]."""

    def get(name):
        for prefix in ("", "bert."):
            key = prefix + name
            if key in state:
                return np.asarray(state[key])
        raise KeyError(name)

    def lin(name):
        return get(name + ".weight").T, get(name + ".bias")

    params = {
        "word_emb": get("embeddings.word_embeddings.weight"),
        "pos_emb": get("embeddings.position_embeddings.weight"),
        "type_emb": get("embeddings.token_type_embeddings.weight"),
        "emb_ln_w": get("embeddings.LayerNorm.weight"),
        "emb_ln_b": get("embeddings.LayerNorm.bias"),
        "layers": [],
    }
    for i in range(n_layers):
        p = f"encoder.layer.{i}."
        q_w, q_b = lin(p + "attention.self.query")
        k_w, k_b = lin(p + "attention.self.key")
        v_w, v_b = lin(p + "attention.self.value")
        ao_w, ao_b = lin(p + "attention.output.dense")
        i_w, i_b = lin(p + "intermediate.dense")
        o_w, o_b = lin(p + "output.dense")
        params["layers"].append(
            {
                "q_w": q_w, "q_b": q_b,
                "k_w": k_w, "k_b": k_b,
                "v_w": v_w, "v_b": v_b,
                "ao_w": ao_w, "ao_b": ao_b,
                "ao_ln_w": get(p + "attention.output.LayerNorm.weight"),
                "ao_ln_b": get(p + "attention.output.LayerNorm.bias"),
                "i_w": i_w, "i_b": i_b,
                "o_w": o_w, "o_b": o_b,
                "o_ln_w": get(p + "output.LayerNorm.weight"),
                "o_ln_b": get(p + "output.LayerNorm.bias"),
            }
        )
    return params


def _random_params(config: dict, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    h = config["hidden_size"]
    inter = config["intermediate_size"]

    def dense(n_in, n_out):
        return (
            rng.normal(0, 0.02, (n_in, n_out)).astype(np.float32),
            np.zeros(n_out, np.float32),
        )

    params = {
        "word_emb": rng.normal(
            0, 0.02, (config["vocab_size"], h)
        ).astype(np.float32),
        "pos_emb": rng.normal(
            0, 0.02, (config["max_position_embeddings"], h)
        ).astype(np.float32),
        "type_emb": rng.normal(0, 0.02, (2, h)).astype(np.float32),
        "emb_ln_w": np.ones(h, np.float32),
        "emb_ln_b": np.zeros(h, np.float32),
        "layers": [],
    }
    for _ in range(config["num_hidden_layers"]):
        q_w, q_b = dense(h, h)
        k_w, k_b = dense(h, h)
        v_w, v_b = dense(h, h)
        ao_w, ao_b = dense(h, h)
        i_w, i_b = dense(h, inter)
        o_w, o_b = dense(inter, h)
        params["layers"].append(
            {
                "q_w": q_w, "q_b": q_b,
                "k_w": k_w, "k_b": k_b,
                "v_w": v_w, "v_b": v_b,
                "ao_w": ao_w, "ao_b": ao_b,
                "ao_ln_w": np.ones(h, np.float32),
                "ao_ln_b": np.zeros(h, np.float32),
                "i_w": i_w, "i_b": i_b,
                "o_w": o_w, "o_b": o_b,
                "o_ln_w": np.ones(h, np.float32),
                "o_ln_b": np.zeros(h, np.float32),
            }
        )
    return params


_MINILM_CONFIG = {
    "hidden_size": 384,
    "num_hidden_layers": 6,
    "num_attention_heads": 12,
    "intermediate_size": 1536,
    "vocab_size": 30522,
    "max_position_embeddings": 512,
}


# --------------------------------------------------------------- the embedder


class MiniLMEmbedder:
    """EmbeddingFunction backed by an on-chip BERT encoder."""

    def __init__(self, params: dict, tokenizer, config: dict):
        self._config = config
        self._config_key = tuple(
            sorted(
                (k, v)
                for k, v in config.items()
                if k in ("hidden_size", "num_attention_heads")
            )
        )
        self._params = jax.tree.map(jnp.asarray, params)
        self._tokenizer = tokenizer
        self._max_len = min(config["max_position_embeddings"], 512)

    # -- constructors

    @classmethod
    def from_pretrained(cls, model_path: Optional[str] = None):
        """Load from the reference's on-disk layout
        (reference: src/embeddings.rs:219-259)."""
        from tokenizers import Tokenizer

        model_dir = Path(model_path or DEFAULT_MODEL_PATH)
        tokenizer_path = model_dir / "tokenizer.json"
        if not tokenizer_path.exists():
            raise EmbeddingError(
                f"Tokenizer file not found: {tokenizer_path}. "
                "Please ensure the model is properly downloaded."
            )
        tokenizer = Tokenizer.from_file(str(tokenizer_path))
        config_path = model_dir / "config.json"
        if not config_path.exists():
            raise EmbeddingError(
                f"Config file not found: {config_path}. "
                "Please ensure the model is properly downloaded."
            )
        config = json.loads(config_path.read_text())
        weights_file = None
        for name in ("model.safetensors", "pytorch_model.bin"):
            if (model_dir / name).exists():
                weights_file = model_dir / name
                break
        if weights_file is None:
            raise EmbeddingError(
                f"Model weights file not found in {model_dir}. "
                "Please ensure the model is properly downloaded."
            )
        state = _load_torch_weights(weights_file)
        params = _map_hf_params(state, config["num_hidden_layers"])
        return cls(params, tokenizer, config)

    @classmethod
    def random_init(cls, seed: int = 0, config: Optional[dict] = None):
        """Deterministic random weights + a trivial whitespace tokenizer;
        exercises the full device compute path without model files."""
        config = config or dict(_MINILM_CONFIG)
        params = _random_params(config, seed)
        return cls(params, _HashTokenizer(config["vocab_size"]), config)

    # -- EmbeddingFunction protocol

    @property
    def dimension(self) -> int:
        return self._config["hidden_size"]

    def generate_embedding(self, text: str) -> list[float]:
        return self.embed_batch([text])[0]

    def embed_batch(self, texts: Sequence[str]) -> list[list[float]]:
        """List-of-lists compat shim over the array path."""
        if not texts:
            return []
        out = self.embed_batch_arrays(texts).astype(np.float64)
        return [list(map(float, row)) for row in out]

    def embed_batch_arrays(self, texts: Sequence[str]) -> np.ndarray:
        """One batched forward -> one device->host fetch -> ``[B, D]`` f32
        ndarray. No per-value Python objects; this is the serving path
        (indexes consume the block directly via add_batch_arrays)."""
        if not texts:
            return np.zeros((0, self.dimension), np.float32)
        b = len(texts)
        ids, mask = tokenize_batch(self._tokenizer, texts, self._max_len)
        out = _embed_step(
            self._params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            config_key=self._config_key,
        )
        return np.asarray(out)[:b]


def _sep_id_of(tokenizer) -> Optional[int]:
    """The tokenizer's [SEP] id, if it has one (HF tokenizers expose
    token_to_id; the random-init hash tokenizer a class attribute)."""
    f = getattr(tokenizer, "token_to_id", None)
    if callable(f):
        try:
            sid = f("[SEP]")
            if sid is not None:
                return int(sid)
        except Exception:
            pass
    sid = getattr(tokenizer, "SEP", None)
    return int(sid) if sid is not None else None


def tokenize_batch(
    tokenizer, texts: Sequence[str], max_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize and stage one batch into the padded ``[B_pad, L_pad]``
    int32 id/mask arrays the jitted forward consumes — THE production
    staging path, factored out so the real-model harness
    (tests/test_real_model.py) can pin it against ``transformers``
    without loading weights.

    * Length bucketing: L_pad is the smallest ``_LEN_BUCKETS`` entry
      covering the batch's longest sequence (bounded recompiles);
      B_pad is the next power of two.
    * Padding uses id 0 — BERT-family ``[PAD]`` — with mask 0, so pad
      rows/cols contribute nothing to attention.
    * Truncation preserves the trailing ``[SEP]``: over-long sequences
      keep their first ``max_len - 1`` tokens plus the separator
      (sentence-transformers' truncate-then-close semantics). The
      reference delegates truncation to tokenizer.json
      (src/embeddings.rs:146, ``encode(text, true)``) which ships
      none for all-MiniLM-L6-v2 and would overrun the 512-position
      table on long inputs; slicing without re-closing would feed the
      encoder a sequence shape it never saw in training.
    """
    if hasattr(tokenizer, "encode_batch"):
        # one FFI crossing; the Rust tokenizer parallelizes internally
        encodings = [
            list(e.ids) for e in tokenizer.encode_batch(list(texts))
        ]
    else:
        encodings = []
        for t in texts:
            e = tokenizer.encode(t)
            encodings.append(
                list(e.ids) if hasattr(e, "ids") else list(e)
            )
    sep = _sep_id_of(tokenizer)
    staged = []
    for row in encodings:
        if len(row) > max_len:
            if sep is not None and row and row[-1] == sep:
                row = row[: max_len - 1] + [sep]
            else:
                row = row[:max_len]
        staged.append(row)
    max_seq = max((len(e) for e in staged), default=1)
    l_pad = next((b for b in _LEN_BUCKETS if b >= max_seq), max_len)
    b = len(staged)
    b_pad = 1 << (b - 1).bit_length() if b > 1 else 1
    ids = np.zeros((b_pad, l_pad), np.int32)
    mask = np.zeros((b_pad, l_pad), np.int32)
    for r, e in enumerate(staged):
        ids[r, : len(e)] = e
        mask[r, : len(e)] = 1
    return ids, mask


class _HashTokenizer:
    """Deterministic stand-in tokenizer for random-init mode: hashes
    whitespace tokens into the vocab, brackets with CLS/SEP ids."""

    CLS, SEP = 101, 102

    def __init__(self, vocab_size: int):
        self._vocab_size = vocab_size

    def encode(self, text: str) -> list[int]:
        import hashlib

        ids = [self.CLS]
        for tok in text.split():
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=4).digest(),
                "little",
            )
            ids.append(1000 + h % (self._vocab_size - 1100))
        ids.append(self.SEP)
        return ids
