"""Golden reference implementations — the fidelity oracle.

None of the reference's compute elements have in-tree unit tests
(SURVEY.md section 4.4), so the C sources are the spec.  Each function here is
a NumPy transcription of one element's hot loop, bit-exact for the integer
elements and float-faithful for the float ones, verified against the cited
file:line in /root/reference.  The JAX/Pallas elements are tested against
these, and bench.py uses them as the single-core CPU throughput denominator.
"""
