"""Random Hadamard transform (incoherence processing), block size 32.

Reference: crates/backend-uzu/src/backends/cpu/kernel/activation_transform/
{mod.rs (hadamard_transform butterfly), activation_transform.rs} and
gpu_types/hadamard_order.rs (HADAMARD_TRANSFORM_BLOCK_SIZE = 32).

TPU formulation: the 32-point butterfly equals multiplication by the
Sylvester Hadamard matrix H/sqrt(32) (orthogonal, symmetric), so the
transform is a [..., K/32, 32] @ [32, 32] matmul XLA maps onto the MXU —
no butterfly loop.

- input RHT:  per block, H @ (signs * x)
- output RHT: per block, signs * (H @ x)
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 32


@lru_cache(maxsize=None)
def _hadamard_matrix() -> np.ndarray:
    h = np.array([[1.0]], np.float32)
    while h.shape[0] < BLOCK:
        h = np.block([[h, h], [h, -h]])
    return h / np.sqrt(BLOCK)


def _blockwise(x: jax.Array) -> jax.Array:
    """x [..., K] -> per-32-block Hadamard."""
    k = x.shape[-1]
    assert k % BLOCK == 0, f"RHT needs K % {BLOCK} == 0, got {k}"
    h = jnp.asarray(_hadamard_matrix())
    xb = x.reshape(*x.shape[:-1], k // BLOCK, BLOCK)
    return jnp.einsum("...bi,ij->...bj", xb, h).reshape(*x.shape[:-1], k)


def input_rht(x: jax.Array, signs: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32) * signs.astype(jnp.float32)
    return _blockwise(xf).astype(x.dtype)


def output_rht(x: jax.Array, signs: jax.Array) -> jax.Array:
    xf = _blockwise(x.astype(jnp.float32))
    return (xf * signs.astype(jnp.float32)).astype(x.dtype)


def transform_weight_for_storage(
    w: np.ndarray, input_signs: np.ndarray, output_signs: np.ndarray
) -> np.ndarray:
    """W -> W' such that output_rht(W' @ input_rht(x)) == W @ x (used by the
    synthesizer/exporter; the quantizer then quantizes W' where incoherence
    has flattened outliers). Derivation: y = S_o H y', x' = H S_i x, so
    W' = H S_o W S_i H (H block-diagonal, orthogonal, H^T = H)."""
    h = _hadamard_matrix()
    n, k = w.shape

    def block_h(m, axis):
        if axis == 0:
            mb = m.reshape(m.shape[0] // BLOCK, BLOCK, m.shape[1])
            return np.einsum("ij,bjm->bim", h, mb).reshape(m.shape)
        mb = m.reshape(m.shape[0], m.shape[1] // BLOCK, BLOCK)
        return np.einsum("mbj,ij->mbi", mb, h).reshape(m.shape)

    scaled = output_signs[:, None].astype(np.float32) * w * input_signs[None, :].astype(np.float32)
    return block_h(block_h(scaled, 0), 1)
