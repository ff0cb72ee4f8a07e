"""Pure-Python kernels: the computational cores of every vectorized UDF.

No Spark imports here. Every function is deterministic and unit-tested against
the reference's pinned semantics (see each module's docstring for the
reference file:line citations).
"""
