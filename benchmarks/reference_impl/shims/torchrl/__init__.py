"""Minimal ``torchrl`` stand-in (specs only) for running the reference
on this machine. See ``torchrl.data``."""
