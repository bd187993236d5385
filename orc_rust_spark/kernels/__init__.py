"""Pure-numpy codec kernels (no Spark imports).

Each module is byte-compatible with the reference encoding it mirrors;
docstrings cite the reference file:line (relative to /root/reference)
that defines the behaviour being reproduced.
"""
