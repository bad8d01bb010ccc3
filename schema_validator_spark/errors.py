"""Engine error types.

The reference distinguishes ``ErrCheckFailed`` (collected as a violation,
rule/registry.go:110-121) from hard errors (abort the run, :122-124).
Here the split is: a failed predicate → a violations-table row; a spec
that cannot compile → ``CompileError`` raised on the driver before any
job is submitted.
"""


class CompileError(ValueError):
    """Raised when a spec or rule cannot be compiled against a schema."""
