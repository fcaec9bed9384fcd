"""Experimental kernels: measured, kept for A/B, NOT on any default path.

The Pallas frontier-scoring kernels live here since round 4. Measured on
TPU v5e (bench A/Bs, benchmarks/NOTES.md): the BlockSpec-pipelined fused
kernels lose to plain-XLA gathers on every edge type, and the K-deep
manual-DMA variants are rejected by this environment's Mosaic remote
compiler. "auto" dispatch therefore resolves to the jnp path (XLA); the
forced modes ("1" fused, "2" deep) remain wired for re-evaluation when
the toolchain moves — see PARITY.md "Kernel choice" for the numbers.
"""
