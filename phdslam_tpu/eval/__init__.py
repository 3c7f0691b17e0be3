"""Evaluation toolchain: batch Monte-Carlo runs, error analysis, plots."""
