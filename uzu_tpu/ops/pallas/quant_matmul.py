"""Fused dequant matmul Pallas kernels (placeholder until kernel milestone)."""

from __future__ import annotations


def quant_matmul_pallas(w, x):
    raise NotImplementedError
