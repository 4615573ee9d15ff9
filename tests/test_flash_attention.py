"""Flash-attention kernel correctness vs the XLA reference path.

Runs in Pallas interpret mode on the CPU host; the same kernel compiles
natively on TPU (exercised by bench.py and the extraction pipeline).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from interspeech_ser_tpu.ops.attention_core import dot_product_attention
from interspeech_ser_tpu.ops.pallas.flash_attention import flash_attention
from interspeech_ser_tpu.ops.pallas.flash_attention_short import attention_bhtd

RNG = np.random.default_rng(10)


def _qkv(B=2, H=4, Tq=300, Tk=300, D=64):
    q = jnp.asarray(RNG.normal(size=(B, H, Tq, D)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(B, H, Tk, D)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, H, Tk, D)).astype(np.float32))
    return q, k, v


class TestFlashAttention:
    def test_matches_xla_unmasked(self):
        q, k, v = _qkv()
        ref = dot_product_attention(q, k, v, force_impl="xla")
        ours = flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_matches_xla_masked(self):
        q, k, v = _qkv(Tk=300)
        mask = np.ones((2, 300), np.float32)
        mask[0, 210:] = 0
        mask[1, 77:] = 0
        ref = dot_product_attention(q, k, v, key_mask=jnp.asarray(mask), force_impl="xla")
        ours = flash_attention(q, k, v, key_mask=jnp.asarray(mask), interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_matches_xla_with_factored_bias(self):
        B, H, T, D = 2, 4, 300, 64
        q, k, v = _qkv(B, H, T, T, D)
        gate = jnp.asarray(RNG.uniform(0.5, 2.0, size=(B, H, T)).astype(np.float32))
        pos_bias = jnp.asarray(RNG.normal(size=(H, T, T)).astype(np.float32))
        mask = np.ones((B, T), np.float32)
        mask[1, 250:] = 0
        ref = dot_product_attention(
            q, k, v, key_mask=jnp.asarray(mask), gate=gate, shared_bias=pos_bias,
            force_impl="xla",
        )
        ours = flash_attention(
            q, k, v, key_mask=jnp.asarray(mask), gate=gate, pos_bias=pos_bias,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("tq,tk", [(128, 384), (257, 129)])
    def test_unaligned_and_rectangular(self, tq, tk):
        q, k, v = _qkv(Tq=tq, Tk=tk)
        mask = np.ones((2, tk), np.float32)
        mask[0, tk - 30 :] = 0
        ref = dot_product_attention(q, k, v, key_mask=jnp.asarray(mask), force_impl="xla")
        ours = flash_attention(q, k, v, key_mask=jnp.asarray(mask), interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_bf16_inputs(self):
        q, k, v = _qkv(Tq=256, Tk=256)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        ref = dot_product_attention(qb, kb, vb, force_impl="xla")
        ours = flash_attention(qb, kb, vb, interpret=True)
        np.testing.assert_allclose(
            np.asarray(ours, dtype=np.float32), np.asarray(ref, dtype=np.float32),
            atol=3e-2,
        )


class TestOneShotShortAttention:
    """One-shot VMEM kernel (flash_attention_short) vs the XLA path.

    Opt-in kernel (SER_TPU_ATTN_IMPL=oneshot): e2e-slower than XLA on
    v5e extraction (see module docstring) but kept correct + tested for
    memory-bound regimes.
    """

    def test_matches_xla_masked(self):
        q, k, v = _qkv(Tk=300)
        mask = np.ones((2, 300), np.float32)
        mask[0, 210:] = 0
        mask[1, 77:] = 0
        ref = dot_product_attention(q, k, v, key_mask=jnp.asarray(mask), force_impl="xla")
        ours = attention_bhtd(q, k, v, key_mask=jnp.asarray(mask), interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_matches_xla_with_factored_bias(self):
        B, H, T, D = 2, 4, 300, 64
        q, k, v = _qkv(B, H, T, T, D)
        gate = jnp.asarray(RNG.uniform(0.5, 2.0, size=(B, H, T)).astype(np.float32))
        pos_bias = jnp.asarray(RNG.normal(size=(H, T, T)).astype(np.float32))
        mask = np.ones((B, T), np.float32)
        mask[1, 250:] = 0
        ref = dot_product_attention(
            q, k, v, key_mask=jnp.asarray(mask), gate=gate, shared_bias=pos_bias,
            force_impl="xla",
        )
        ours = attention_bhtd(
            q, k, v, key_mask=jnp.asarray(mask), gate=gate, pos_bias=pos_bias,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_dispatch_via_attention_core(self):
        q, k, v = _qkv(Tq=200, Tk=200)
        mask = jnp.ones((2, 200), jnp.float32)
        ref = dot_product_attention(q, k, v, key_mask=mask, force_impl="xla")
        # force_impl plumbs through pick_impl; interpret auto-enables on cpu
        ours = dot_product_attention(q, k, v, key_mask=mask, force_impl="oneshot")
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


class TestOneShotBTDAttention:
    """v2 kernel on [B, T, D] projection-layout inputs (oneshot2)."""

    def _btd(self, B=2, H=4, Tq=300, Tk=300, hd=64):
        D = H * hd
        q = jnp.asarray(RNG.normal(size=(B, Tq, D)).astype(np.float32))
        k = jnp.asarray(RNG.normal(size=(B, Tk, D)).astype(np.float32))
        v = jnp.asarray(RNG.normal(size=(B, Tk, D)).astype(np.float32))
        return q, k, v

    def _ref(self, q, k, v, H, **kw):
        B, Tq, D = q.shape
        hd = D // H
        qh = q.reshape(B, Tq, H, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
        out = dot_product_attention(qh, kh, vh, force_impl="xla", **kw)
        return out.transpose(0, 2, 1, 3).reshape(B, Tq, D)

    def test_matches_xla_masked(self):
        from interspeech_ser_tpu.ops.pallas.flash_attention_short import attention_btd

        q, k, v = self._btd()
        mask = np.ones((2, 300), np.float32)
        mask[0, 210:] = 0
        mask[1, 77:] = 0
        ref = self._ref(q, k, v, 4, key_mask=jnp.asarray(mask))
        ours = attention_btd(q, k, v, 4, key_mask=jnp.asarray(mask), interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_matches_xla_with_factored_bias(self):
        from interspeech_ser_tpu.ops.pallas.flash_attention_short import attention_btd

        B, H, T, hd = 2, 4, 300, 64
        q, k, v = self._btd(B, H, T, T, hd)
        gate = jnp.asarray(RNG.uniform(0.5, 2.0, size=(B, H, T)).astype(np.float32))
        pos_bias = jnp.asarray(RNG.normal(size=(H, T, T)).astype(np.float32))
        mask = np.ones((B, T), np.float32)
        mask[1, 250:] = 0
        ref = self._ref(
            q, k, v, H, key_mask=jnp.asarray(mask), gate=gate, shared_bias=pos_bias
        )
        ours = attention_btd(
            q, k, v, H, key_mask=jnp.asarray(mask), gate=gate, pos_bias=pos_bias,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize(
        "flags", ["exp2", "psum", "fused", "exp2,psum,fused"]
    )
    def test_softmax_opt_flags_exact(self, flags, monkeypatch):
        """SER_TPU_SOFTMAX_OPT combos (measured dead even on v5e, kept as
        an experiment surface) must stay exact in f32: exp2 is a base
        change, psum is an identity cast, fused is reassociation."""
        from interspeech_ser_tpu.ops.pallas.flash_attention_short import attention_btd

        B, H, T, hd = 2, 4, 300, 64
        q, k, v = self._btd(B, H, T, T, hd)
        gate = jnp.asarray(RNG.uniform(0.5, 2.0, size=(B, H, T)).astype(np.float32))
        pos_bias = jnp.asarray(RNG.normal(size=(H, T, T)).astype(np.float32))
        mask = np.ones((B, T), np.float32)
        mask[1, 250:] = 0
        ref = self._ref(
            q, k, v, H, key_mask=jnp.asarray(mask), gate=gate, shared_bias=pos_bias
        )
        monkeypatch.setenv("SER_TPU_SOFTMAX_OPT", flags)
        ours = attention_btd(
            q, k, v, H, key_mask=jnp.asarray(mask), gate=gate, pos_bias=pos_bias,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_softmax_opt_unknown_flag_raises(self, monkeypatch):
        from interspeech_ser_tpu.ops.pallas.flash_attention_short import attention_btd

        q, k, v = self._btd()
        monkeypatch.setenv("SER_TPU_SOFTMAX_OPT", "nope")
        with pytest.raises(ValueError, match="unknown flags"):
            attention_btd(q, k, v, 4, interpret=True)

    def test_nonsquare_head_dim(self):
        # HuBERT-XL shape: hd=80 (non-power-of-two lane block)
        from interspeech_ser_tpu.ops.pallas.flash_attention_short import attention_btd

        q, k, v = self._btd(B=2, H=4, Tq=130, Tk=130, hd=80)
        ref = self._ref(q, k, v, 4)
        ours = attention_btd(q, k, v, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("tk", [300, 256])  # padded (300→384) and exact
    def test_maskless_fast_path_exact(self, tk):
        """key_mask=None takes the no-madd path: padded key columns are
        neutralized by the real-lane-slice denominator sum
        (l = Σ p[:, :Tk]; zero-padded K scores exactly 0), which must
        equal the masked computation to f32 eps — the whisper production
        case (fixed 30-s windows pass no mask;
        scripts/exp_whisper_flash.py r04)."""
        from interspeech_ser_tpu.ops.pallas.flash_attention_short import attention_btd

        q, k, v = self._btd(B=2, H=4, Tq=tk, Tk=tk, hd=64)
        ref = self._ref(q, k, v, 4, key_mask=None)
        ours = attention_btd(q, k, v, 4, key_mask=None, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_maskless_all_negative_scores(self):
        """Review-found bug (r04): when a query row's real scores all sit
        far below 0, the lane-padded zero scores dominate the row max and
        the earlier analytic denominator fixup (l -= n_pad·exp(-m))
        cancelled the entire f32 sum — outputs exploded ~1e20. The
        real-slice denominator sum must stay exact here."""
        from interspeech_ser_tpu.ops.pallas.flash_attention_short import attention_btd

        B, H, T, hd = 1, 2, 300, 64  # T=300 → padded to 384 (n_pad=84)
        D = H * hd
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
        # anti-aligned k ⇒ every real score ≈ -hd·scale ≪ 0
        k = -q * 3.0
        v = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
        ref = self._ref(q, k, v, H, key_mask=None)
        ours = attention_btd(q, k, v, H, key_mask=None, interpret=True)
        assert np.isfinite(np.asarray(ours)).all()
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_maskless_with_factored_bias_exact(self):
        from interspeech_ser_tpu.ops.pallas.flash_attention_short import attention_btd

        B, H, T, hd = 2, 4, 300, 64
        q, k, v = self._btd(B, H, T, T, hd)
        gate = jnp.asarray(RNG.uniform(0.5, 2.0, size=(B, H, T)).astype(np.float32))
        pos_bias = jnp.asarray(RNG.normal(size=(H, T, T)).astype(np.float32))
        ref = self._ref(q, k, v, H, key_mask=None, gate=gate, shared_bias=pos_bias)
        ours = attention_btd(
            q, k, v, H, key_mask=None, gate=gate, pos_bias=pos_bias, interpret=True
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_nomax_flag_maskless_exact(self, monkeypatch):
        """'nomax' (skip the max-shift reduce; measured NEGATIVE on v5e,
        zero-default experiment) must stay exact on bounded inputs — the
        real-lane-slice denominator sum ignores the padded exp(0)=1
        columns regardless of the shift."""
        from interspeech_ser_tpu.ops.pallas.flash_attention_short import attention_btd

        q, k, v = self._btd(B=2, H=4, Tq=300, Tk=300, hd=64)
        ref = self._ref(q, k, v, 4, key_mask=None)
        monkeypatch.setenv("SER_TPU_SOFTMAX_OPT", "fused,nomax")
        ours = attention_btd(q, k, v, 4, key_mask=None, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_lane_blocked_fallback_branch(self, monkeypatch):
        """Shrink the VMEM budget so the no-bias lane-blocked grid path
        (very large D·Tk on hardware) is exercised in interpret mode."""
        import interspeech_ser_tpu.ops.pallas.flash_attention_short as fas

        q, k, v = self._btd(B=2, H=4, Tq=256, Tk=256, hd=64)  # D=256
        ref = self._ref(q, k, v, 4)
        monkeypatch.setattr(fas, "_VMEM_BUDGET", 300_000)  # forces lane blocking
        mask = np.ones((2, 256), np.float32)
        mask[1, 200:] = 0
        ref_m = self._ref(q, k, v, 4, key_mask=jnp.asarray(mask))
        ours = fas.attention_btd(q, k, v, 4, interpret=True)
        ours_m = fas.attention_btd(q, k, v, 4, key_mask=jnp.asarray(mask), interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ours_m), np.asarray(ref_m), atol=2e-5)

    def test_lane_blocked_maskless_padded_keys(self, monkeypatch):
        """Lane-blocked branch + maskless fast path + Tk lane padding
        (300→384): the real-lane-slice denominator sum must hold per
        head-block too."""
        import interspeech_ser_tpu.ops.pallas.flash_attention_short as fas

        q, k, v = self._btd(B=2, H=4, Tq=300, Tk=300, hd=64)  # D=256
        ref = self._ref(q, k, v, 4, key_mask=None)
        monkeypatch.setattr(fas, "_VMEM_BUDGET", 300_000)  # forces lane blocking
        ours = fas.attention_btd(q, k, v, 4, key_mask=None, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_lane_blocked_with_bias_raises_budget_error(self, monkeypatch):
        import interspeech_ser_tpu.ops.pallas.flash_attention_short as fas

        B, H, T, hd = 2, 4, 256, 64
        q, k, v = self._btd(B, H, T, T, hd)
        bias = jnp.asarray(RNG.normal(size=(H, T, T)).astype(np.float32))
        monkeypatch.setattr(fas, "_VMEM_BUDGET", 300_000)
        with pytest.raises(fas.VmemBudgetError):
            fas.attention_btd(q, k, v, H, pos_bias=bias, interpret=True)

    def test_dispatch_via_attention_core_btd(self):
        from interspeech_ser_tpu.ops.attention_core import dot_product_attention_btd

        q, k, v = self._btd(Tq=200, Tk=200)
        mask = jnp.ones((2, 200), jnp.float32)
        ref = self._ref(q, k, v, 4, key_mask=mask)
        ours = dot_product_attention_btd(
            q, k, v, 4, key_mask=mask, force_impl="oneshot2"
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)
