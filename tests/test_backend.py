"""End-to-end backend selection tests (VERDICT r2 item 4).

The reference chooses its limb backend with a cargo feature
(/root/reference/src/backend/mod.rs:9-16); here `config.set_backend` /
`use_backend` routes FieldElement/Scalar through the registry
(ops/limb.BACKENDS), and each value carries its ModSpec as static pytree
metadata.  One end-to-end flow per backend: construct -> ring ops ->
inverse -> sqrt_ratio_i -> bytes, verified against the big-int oracle.
"""

import numpy as np
import pytest

from zerocaf_tpu import FieldElement, Scalar, config
from zerocaf_tpu import oracle as o
from zerocaf_tpu.ops import limb as l

VALS = [0, 1, 5, o.P - 1, 123456789, 1 << 200, 3, 17]


def _e2e_field(expect_spec):
    a = FieldElement.from_int(np.array(VALS, dtype=object))
    b = FieldElement.from_int(np.array(VALS[::-1], dtype=object))
    assert a.spec is expect_spec
    assert a.limbs.shape[-1] == expect_spec.nlimbs

    got = (a * b + a - b).to_ints()
    want = [(x * y + x - y) % o.P for x, y in zip(VALS, VALS[::-1])]
    assert list(got) == want

    inv = a.inverse().to_ints()
    assert list(inv) == [pow(x, o.P - 2, o.P) for x in VALS]

    ok, r = a.sqrt_ratio_i(FieldElement.one().broadcast_to((len(VALS),)))
    okh, rh = np.asarray(ok), r.to_ints()
    for x, k, root in zip(VALS, okh, rh):
        if x == 0:
            assert k and root == 0
        elif pow(x, (o.P - 1) // 2, o.P) == 1:
            assert k and pow(int(root), 2, o.P) == x % o.P
        else:
            assert not k

    byts = np.asarray(a.to_bytes())
    assert [int.from_bytes(bytes(row), "little") for row in byts] == \
        [v % o.P for v in VALS]


def _e2e_scalar(expect_spec):
    s = Scalar.from_int(np.array(VALS, dtype=object))
    t = Scalar.from_int(np.array(VALS[::-1], dtype=object))
    assert s.spec is expect_spec
    got = (s * t + s).to_ints()
    assert list(got) == [(x * y + x) % o.R for x, y in zip(VALS, VALS[::-1])]
    byts = np.asarray(s.to_bytes())
    assert [int.from_bytes(bytes(row), "little") for row in byts] == \
        [v % o.R for v in VALS]


def test_default_backend_i32x22():
    assert config.get_backend() == "i32x22"
    _e2e_field(l.FIELD)
    _e2e_scalar(l.SCALAR)


def test_f32x29_backend_end_to_end():
    with config.use_backend("f32x29"):
        assert config.get_backend() == "f32x29"
        _e2e_field(l.FIELD_F9)
        _e2e_scalar(l.SCALAR_F9)
    assert config.get_backend() == "i32x22"


def test_cross_backend_byte_agreement():
    """The two backends are observationally identical: same canonical bytes
    from the same mixed computation."""
    a1 = FieldElement.from_int(np.array(VALS, dtype=object))
    with config.use_backend("f32x29"):
        a2 = FieldElement.from_int(np.array(VALS, dtype=object))
    r1 = (a1 * a1 + a1).to_bytes()
    r2 = (a2 * a2 + a2).to_bytes()
    assert (np.asarray(r1) == np.asarray(r2)).all()


def test_explicit_spec_override():
    """A spec passed explicitly wins over the active config."""
    a = FieldElement.from_int(7, spec=l.FIELD_F9)
    assert a.spec is l.FIELD_F9
    assert a.limbs.shape[-1] == 29
    assert int(a.square().to_ints()) == 49


def test_unknown_backend_rejected():
    with pytest.raises(ValueError):
        config.set_backend("u64")


def test_spec_is_static_metadata():
    """jit treats the spec as static: tracing caches per backend."""
    import jax

    @jax.jit
    def f(x: FieldElement):
        return x * x

    a = FieldElement.from_int(np.array([2, 3, 4, 5]))
    b = FieldElement.from_int(np.array([2, 3, 4, 5]), spec=l.FIELD_F9)
    assert list(f(a).to_ints()) == [4, 9, 16, 25]
    assert list(f(b).to_ints()) == [4, 9, 16, 25]
