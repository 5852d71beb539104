"""Entry-point scripts (training, evaluation, serving, benchmarking).

A real package so console scripts in pyproject.toml can target these modules
(reference ships `scripts/` as loose files run via `python scripts/...`,
reference `pyproject.toml:1`; we support both invocation styles).
"""
