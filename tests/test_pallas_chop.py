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


def test_pallas_production_kernel_matches_xla():
    """count_unique_fast_pallas (fused chop + pair sort + pair RLE) must
    produce the same compacted (unique, counts) as the XLA production
    kernel count_unique_fast."""
    from jax.experimental.pallas import tpu as pltpu
    from dbg_assembly_tpu.kmer import count as kc

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=(300, 80), dtype=np.uint8)
    codes[100:200] = codes[:100]
    lengths = rng.integers(31, 81, size=300).astype(np.int32)
    u1, c1, nu1, nv1 = kc.count_unique_fast(jnp.asarray(codes),
                                            jnp.asarray(lengths), 31)
    with pltpu.force_tpu_interpret_mode():
        u2, c2, nu2, nv2 = kc.count_unique_fast_pallas(
            jnp.asarray(codes), jnp.asarray(lengths), 31, block=64)
    assert int(nu1) == int(nu2) and int(nv1) == int(nv2)
    u1, c1, u2, c2 = map(np.asarray, (u1, c1, u2, c2))
    k1 = u1 != kc.SENTINEL
    k2 = u2 != kc.SENTINEL
    assert np.array_equal(u1[k1], u2[k2])
    assert np.array_equal(c1[k1], c2[k2])


def test_pallas_count_pipeline_matches_xla():
    """count_spectrum_fast_pallas (fused chop + pair sort + pair stats)
    must equal the XLA fast pipeline exactly."""
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from dbg_assembly_tpu.kmer import count as kc

    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, size=(300, 80), dtype=np.uint8)
    lengths = rng.integers(31, 81, size=300).astype(np.int32)
    s1, u1, v1 = kc.count_spectrum_fast(jnp.asarray(codes),
                                        jnp.asarray(lengths), 31)
    with pltpu.force_tpu_interpret_mode():
        s2, u2, v2 = kc.count_spectrum_fast_pallas(
            jnp.asarray(codes), jnp.asarray(lengths), 31, block=64)
    assert int(u1) == int(u2) and int(v1) == int(v2)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
