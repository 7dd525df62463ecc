"""Quantized weight representation + pack/unpack/dequantize.

On-disk layout matches the reference exactly (crates/backend-uzu/src/
encodable_block/linear/matmul.rs:94-194 and backends/cpu/kernel/matmul/
kernel.rs:220-275):

- ``weights``: uint8 ``[N, K/pack]`` — unsigned codes packed little-endian
  along K (4-bit: low nibble = even k).
- ``scales``: ``[N, ceil(K/g)]`` in the weights float dtype.
- method ScaleBias (MLX): ``biases`` ``[N, ceil(K/g)]``; w = scale*code + bias.
- method ScaleZeroPoint: ``zero_points`` uint8 ``[N, ceil(ceil(K/g)/pack)]``
  packed like codes; w = scale*(code - zp).
- method ScaleSymmetric: w = scale*(code - 2^(bits-1)).

In memory we canonicalize all three to ``w = scale*code + qbias`` with a
precomputed per-group ``qbias`` (= mlx bias, -scale*zp, or -scale*midpoint),
so a single fused kernel covers every method.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["codes", "scales", "qbias"],
    meta_fields=["bits", "group_size", "qbias_coeff"],
)
@dataclasses.dataclass
class QuantizedTensor:
    """A [N, K] weight matrix stored as packed unsigned codes + group params.

    w[n, k] = scales[n, k//g] * code[n, k] + qbias[n, k//g]

    For symmetric quantization qbias is exactly ``-2^(bits-1) * scales`` —
    a power-of-two multiple, so deriving it from the scales is bit-identical
    to storing it and saves the whole [N, Kg] qbias stream (~10% of the
    weight bytes every decode step). Such tensors carry ``qbias=None`` and
    the static ``qbias_coeff``; consumers either fold the coefficient
    (kernels) or materialize via ``qbias_of``.
    """

    codes: jax.Array  # uint8 [N, K // (8//bits)]
    scales: jax.Array  # [N, ceil(K/g)] float
    qbias: jax.Array | None  # [N, ceil(K/g)] float, or None (see qbias_coeff)
    bits: int
    group_size: int
    qbias_coeff: float | None = None  # qbias == qbias_coeff * scales

    @property
    def shape(self) -> tuple[int, int]:
        n, kp = self.codes.shape
        return (n, kp * (8 // self.bits))

    @property
    def dtype(self):
        return self.scales.dtype


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["codes", "scales"],
    meta_fields=["bits", "group_size", "qbias_coeff"],
)
@dataclasses.dataclass
class StackedQuantized:
    """A stack of E symmetric-quantized [N, K] matrices (MoE expert
    weights — real gpt-oss ships MXFP4 experts; this is the INT4/INT8
    analogue). codes [E, N, K/pack] packed u8, scales [E, N, Kg]; the
    expert dim slices with dynamic_index so decode reads only the K
    active experts' bytes (4x fewer than bf16 at 4 bits)."""

    codes: jax.Array  # uint8 [E, N, K // (8//bits)]
    scales: jax.Array  # [E, N, ceil(K/g)]
    bits: int
    group_size: int
    qbias_coeff: float  # symmetric: qbias == qbias_coeff * scales

    @property
    def shape(self) -> tuple[int, int, int]:
        e, n, kp = self.codes.shape
        return (e, n, kp * (8 // self.bits))

    @property
    def nbytes(self) -> int:
        return self.codes.nbytes + self.scales.nbytes

    def expert(self, idx) -> "QuantizedTensor":
        """Traced-index expert slice as a 2D QuantizedTensor view."""
        return QuantizedTensor(
            codes=jax.lax.dynamic_index_in_dim(self.codes, idx, 0,
                                               keepdims=False),
            scales=jax.lax.dynamic_index_in_dim(self.scales, idx, 0,
                                                keepdims=False),
            qbias=None,
            bits=self.bits,
            group_size=self.group_size,
            qbias_coeff=self.qbias_coeff,
        )


def dequantize_stacked(sq: StackedQuantized, dtype=jnp.bfloat16) -> jax.Array:
    """[E, N, K] dense materialization (prefill paths: compute-bound, so
    the 2x transient read is paid once per chunk, not per decode step)."""
    e, n, k = sq.shape
    codes = unpack_codes(sq.codes, sq.bits).astype(jnp.int32)
    mid = float(1 << (sq.bits - 1))
    sc = jnp.repeat(sq.scales.astype(jnp.float32), sq.group_size, axis=-1)[
        :, :, :k]
    return ((codes.astype(jnp.float32) - mid) * sc).astype(dtype)


def unpack_codes(codes: jax.Array, bits: int) -> jax.Array:
    """uint8 packed [..., K/pack] -> uint8 unpacked [..., K] (unsigned codes)."""
    if bits == 8:
        return codes
    if bits == 4:
        lo = codes & 0xF
        hi = codes >> 4
        return jnp.stack([lo, hi], axis=-1).reshape(*codes.shape[:-1], -1)
    raise ValueError(f"unsupported bits={bits}")


def pack_codes(codes: np.ndarray, bits: int) -> np.ndarray:
    """numpy: unsigned codes [..., K] -> packed uint8 [..., K/pack]."""
    codes = np.asarray(codes, dtype=np.uint8)
    if bits == 8:
        return codes
    if bits == 4:
        assert codes.shape[-1] % 2 == 0
        lo = codes[..., 0::2]
        hi = codes[..., 1::2]
        return (lo | (hi << 4)).astype(np.uint8)
    raise ValueError(f"unsupported bits={bits}")


def qbias_of(qt: "QuantizedTensor") -> jax.Array:
    """Materialized [N, Kg] qbias — bit-identical to the stored form for
    coefficient tensors (power-of-two multiply commutes with rounding)."""
    if qt.qbias is not None:
        return qt.qbias
    return (qt.scales.astype(jnp.float32) * qt.qbias_coeff).astype(qt.scales.dtype)


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Reference dequantization (pure XLA); kernels fuse this instead."""
    n, k = qt.shape
    codes = unpack_codes(qt.codes, qt.bits).astype(jnp.float32)
    g = qt.group_size
    kg = qt.scales.shape[1]
    # broadcast group params over K (last group may be partial)
    scales = jnp.repeat(qt.scales.astype(jnp.float32), g, axis=1)[:, :k]
    qbias = jnp.repeat(qbias_of(qt).astype(jnp.float32), g, axis=1)[:, :k]
    del kg
    return (codes * scales + qbias).astype(dtype)


def make_qbias(
    method: str,
    scales: np.ndarray,
    bits: int,
    zero_points_packed: np.ndarray | None = None,
    mlx_biases: np.ndarray | None = None,
) -> np.ndarray:
    """Compute the canonical per-group bias term from on-disk tensors."""
    s = np.asarray(scales, dtype=np.float32)
    if method == "scale_bias":
        return np.asarray(mlx_biases, dtype=np.float32)
    if method == "scale_zero_point":
        kg = s.shape[1]
        zp = np.asarray(zero_points_packed)
        if bits == 4:
            unpacked = np.stack([zp & 0xF, zp >> 4], axis=-1).reshape(zp.shape[0], -1)[:, :kg]
        else:
            unpacked = zp[:, :kg]
        return (-s * unpacked.astype(np.float32)).astype(np.float32)
    if method == "scale_symmetric":
        midpoint = float(1 << (bits - 1))
        return (-s * midpoint).astype(np.float32)
    raise ValueError(f"unknown quantization method {method!r}")


def quantize_reference(
    w: np.ndarray, bits: int, group_size: int, method: str = "scale_symmetric", dtype=None
) -> dict[str, np.ndarray]:
    """Quantize a float [N, K] matrix into on-disk tensors (for tests/tools).

    Returns dict with keys weights/scales (+biases or zero_points) matching
    the reference's safetensors layout.
    """
    import ml_dtypes

    dtype = dtype or ml_dtypes.bfloat16
    n, k = w.shape
    assert k % group_size == 0, "partial trailing groups unsupported in the quantizer"
    levels = (1 << bits) - 1
    grouped = w.reshape(n, k // group_size, group_size).astype(np.float32)
    if method == "scale_symmetric":
        amax = np.abs(grouped).max(axis=-1, keepdims=True)
        mid = float(1 << (bits - 1))
        scale = amax / mid
        scale = np.where(scale == 0, 1e-8, scale)
        codes = np.clip(np.round(grouped / scale + mid), 0, levels).astype(np.uint8)
        out = {
            "weights": pack_codes(codes.reshape(n, k), bits),
            "scales": scale[..., 0].astype(dtype),
        }
    elif method == "scale_bias":
        wmin = grouped.min(axis=-1, keepdims=True)
        wmax = grouped.max(axis=-1, keepdims=True)
        scale = (wmax - wmin) / levels
        scale = np.where(scale == 0, 1e-8, scale)
        codes = np.clip(np.round((grouped - wmin) / scale), 0, levels).astype(np.uint8)
        out = {
            "weights": pack_codes(codes.reshape(n, k), bits),
            "scales": scale[..., 0].astype(dtype),
            "biases": wmin[..., 0].astype(dtype),
        }
    elif method == "scale_zero_point":
        wmin = grouped.min(axis=-1, keepdims=True)
        wmax = grouped.max(axis=-1, keepdims=True)
        scale = (wmax - wmin) / levels
        scale = np.where(scale == 0, 1e-8, scale)
        zp = np.clip(np.round(-wmin / scale), 0, levels).astype(np.uint8)
        codes = np.clip(np.round(grouped / scale) + zp, 0, levels).astype(np.uint8)
        kg = k // group_size
        zp2 = zp[..., 0]
        if bits == 4:
            if kg % 2:
                zp2 = np.concatenate([zp2, np.zeros((n, 1), np.uint8)], axis=1)
            zp_packed = (zp2[:, 0::2] | (zp2[:, 1::2] << 4)).astype(np.uint8)
        else:
            zp_packed = zp2
        out = {
            "weights": pack_codes(codes.reshape(n, k), bits),
            "scales": scale[..., 0].astype(dtype),
            "zero_points": zp_packed,
        }
    else:
        raise ValueError(method)
    return out


def from_disk_tensors(
    method: str,
    weights: np.ndarray,
    scales: np.ndarray,
    bits: int,
    group_size: int,
    zero_points: np.ndarray | None = None,
    biases: np.ndarray | None = None,
    dtype=jnp.bfloat16,
) -> QuantizedTensor:
    """Build the canonical in-memory form from on-disk tensors."""
    if method == "scale_symmetric":
        # qbias == -midpoint * scales exactly: carry the coefficient, skip
        # the stream (bit-identical — power-of-two multiply is exact).
        return QuantizedTensor(
            codes=jnp.asarray(weights),
            scales=jnp.asarray(np.asarray(scales, np.float32), dtype=dtype),
            qbias=None,
            bits=bits,
            group_size=group_size,
            qbias_coeff=-float(1 << (bits - 1)),
        )
    qbias = make_qbias(method, scales, bits, zero_points, biases)
    return QuantizedTensor(
        codes=jnp.asarray(weights),
        scales=jnp.asarray(np.asarray(scales, np.float32), dtype=dtype),
        qbias=jnp.asarray(qbias, dtype=dtype),
        bits=bits,
        group_size=group_size,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["base", "adapter_down", "adapter_up", "input_signs", "output_signs"],
    meta_fields=[],
)
@dataclasses.dataclass
class HybridLinear:
    """HybridSpec weights (reference: config/weight_matrix/hybrid_spec.rs +
    encodable_block/linear/{qlora_wrapper,rht_wrapper}.rs): a quantized base
    stored in the incoherence-transformed domain, plus an optional low-rank
    adapter and optional per-dim Hadamard sign vectors.

    Forward (qlora_wrapper.rs:163-240 order):
        inter = x @ adapter_down^T                (on the RAW input)
        y = base @ input_rht(x)                   (signs present)
        y += inter @ adapter_up^T
        y = output_rht(y)                         (signs present)
    """

    base: QuantizedTensor
    adapter_down: jax.Array | None  # [rank, K]
    adapter_up: jax.Array | None  # [N, rank]
    input_signs: jax.Array | None  # [K] f32 (+-1)
    output_signs: jax.Array | None  # [N] f32 (+-1)

    @property
    def shape(self):
        return self.base.shape

    @property
    def dtype(self):
        return self.base.dtype
