"""JAX/Pallas kernels — the analog of the reference's ORC kernel layer
(SURVEY.md section 2.1 "ORC kernel layer": *.orc compiled to SIMD).

Everything here is a pure function over device arrays with explicit dtypes.
XLA fuses chains of the point ops into single kernels; Pallas implementations
exist for the bandwidth-critical fused paths (ops/fused_pallas.py).
"""
