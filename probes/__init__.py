"""Measured negative-result kernels, kept OUT of the package.

These are complete, tested Pallas kernels that LOST their on-chip A/B against
the XLA lowering (measurements in docs/PERF.md, "Stem speed-of-light").  They
stay in the tree so the negative results are reproducible — `bench_profile.py`
re-runs the A/Bs against them — but they are not importable from
`speechdrivestemplates_tpu` and carry no production code path.
"""
