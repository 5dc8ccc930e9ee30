"""Pallas chop kernel must match the XLA rolling-kmer path (interpret mode
on CPU; the compiled path runs on TPU in bench)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dbg_assembly_tpu import dna


@pytest.mark.parametrize("ksize", [15, 21, 31])
def test_pallas_chop_matches_xla(ksize):
    from dbg_assembly_tpu.ops import pallas_chop as pc
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    N, L = 64, 100
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)

    km = dna.rolling_kmers(codes, ksize)
    can, _ = dna.canonical(km, ksize)

    with pltpu.force_tpu_interpret_mode():
        hi, lo = pc.chop_canonical_pallas(jnp.asarray(codes), ksize,
                                          block=32)
    got = np.asarray(pc.combine_u64(hi, lo))
    assert np.array_equal(got, can)
