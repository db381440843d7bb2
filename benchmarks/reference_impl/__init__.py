"""Run the REFERENCE library (``/root/reference``) on this machine to
record ground-truth learning curves for parity testing.

The reference's deps ``tensordict``/``torchrl``/``mlflow`` are not
installed here; ``shims/`` provides minimal clean-room stand-ins for
exactly the API surface the reference uses, so the reference's own
algorithm/env/model code — not a re-implementation — produces the
curves committed under ``benchmarks/curves/reference/``.
"""
