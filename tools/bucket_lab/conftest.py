"""Bench-lab tests run on the host CPU backend (the dev TPU attachment
pays ~2.5 min of tunnel init per process — CLAUDE.md)."""

import jax

jax.config.update("jax_platforms", "cpu")
