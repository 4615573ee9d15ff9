"""Golden parity: RoBERTa + DeBERTa-v2 vs randomly-initialized HF models."""

import numpy as np
import torch

import jax.numpy as jnp

from interspeech_ser_tpu.models.convert_hf import deberta_v2_hf_to_flax, roberta_hf_to_flax
from interspeech_ser_tpu.models.text import (
    DebertaV2Config,
    DebertaV2Model,
    RobertaConfig,
    RobertaModel,
)

RNG = np.random.default_rng(8)


def _ids_and_mask(vocab, B=2, T=24, pad=1):
    lengths = [T, T - 7]
    ids = np.full((B, T), pad, np.int64)
    mask = np.zeros((B, T), np.int64)
    for i, l in enumerate(lengths):
        ids[i, :l] = RNG.integers(pad + 2, vocab, size=l)
        mask[i, :l] = 1
    return ids, mask, lengths


class TestRobertaParity:
    def _build(self):
        from transformers import RobertaConfig as HFConfig, RobertaModel as HFModel

        torch.manual_seed(0)
        hf_cfg = HFConfig(
            vocab_size=200, hidden_size=32, num_hidden_layers=3,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, type_vocab_size=1, pad_token_id=1,
        )
        hf = HFModel(hf_cfg, add_pooling_layer=False)
        hf.eval()
        cfg = RobertaConfig.from_hf(hf_cfg)
        params = roberta_hf_to_flax({k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
        return hf, RobertaModel(cfg), params

    def test_hidden_states_match(self):
        hf, model, params = self._build()
        ids, mask, _ = _ids_and_mask(200)
        with torch.no_grad():
            ref = hf(
                torch.tensor(ids), attention_mask=torch.tensor(mask),
                output_hidden_states=True,
            )
        ours = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
        assert len(ref.hidden_states) == len(ours["hidden_states"])
        for i, (r, o) in enumerate(zip(ref.hidden_states, ours["hidden_states"])):
            # padded positions differ (HF lets them attend; values unused) —
            # compare valid positions only
            np.testing.assert_allclose(
                np.asarray(o)[0], r.numpy()[0], atol=2e-4, err_msg=f"h[{i}] row0"
            )
            np.testing.assert_allclose(
                np.asarray(o)[1, :17], r.numpy()[1, :17], atol=2e-4, err_msg=f"h[{i}] row1"
            )

    def test_batched_padded_equals_single(self):
        hf, model, params = self._build()
        ids, mask, lengths = _ids_and_mask(200)
        ours = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
        single = model.apply({"params": params}, jnp.asarray(ids[1:, : lengths[1]]))
        np.testing.assert_allclose(
            np.asarray(ours["last_hidden_state"])[1, : lengths[1]],
            np.asarray(single["last_hidden_state"])[0],
            atol=2e-4,
        )


class TestDebertaV2Parity:
    def _build(self, **overrides):
        from transformers import DebertaV2Config as HFConfig, DebertaV2Model as HFModel

        torch.manual_seed(1)
        kwargs = dict(
            vocab_size=200, hidden_size=32, num_hidden_layers=3,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, type_vocab_size=0,
            relative_attention=True, position_buckets=8,
            norm_rel_ebd="layer_norm", share_att_key=True,
            pos_att_type=["p2c", "c2p"], position_biased_input=False,
            conv_kernel_size=3, conv_act="gelu", layer_norm_eps=1e-7,
        )
        kwargs.update(overrides)
        hf_cfg = HFConfig(**kwargs)
        hf = HFModel(hf_cfg)
        hf.eval()
        cfg = DebertaV2Config.from_hf(hf_cfg)
        params = deberta_v2_hf_to_flax(
            {k: v.numpy() for k, v in hf.state_dict().items()}, cfg
        )
        return hf, DebertaV2Model(cfg), params

    def test_hidden_states_match(self):
        hf, model, params = self._build()
        ids, mask, lengths = _ids_and_mask(200, pad=0)
        with torch.no_grad():
            ref = hf(
                torch.tensor(ids), attention_mask=torch.tensor(mask),
                output_hidden_states=True,
            )
        ours = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
        assert len(ref.hidden_states) == len(ours["hidden_states"])
        for i, (r, o) in enumerate(zip(ref.hidden_states, ours["hidden_states"])):
            np.testing.assert_allclose(
                np.asarray(o)[0], r.numpy()[0], atol=3e-4, err_msg=f"h[{i}] row0"
            )
            np.testing.assert_allclose(
                np.asarray(o)[1, : lengths[1]], r.numpy()[1, : lengths[1]],
                atol=3e-4, err_msg=f"h[{i}] row1",
            )

    def test_no_bucket_variant(self):
        """position_buckets=-1 → raw relative positions (deberta-v2 default)."""
        hf, model, params = self._build(position_buckets=-1, conv_kernel_size=0)
        ids, mask, _ = _ids_and_mask(200, T=16, pad=0)
        with torch.no_grad():
            ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
        ours = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
        np.testing.assert_allclose(
            np.asarray(ours["last_hidden_state"])[0],
            ref.last_hidden_state.numpy()[0],
            atol=3e-4,
        )


class TestGatherLastStatic:
    """The one-hot-matmul static select must equal take_along_axis exactly
    (it replaced a lane-dim gather that ran ~6 ms/layer on TPU — see
    models/text.py:_gather_last_static)."""

    def _check(self, t, span, buckets, max_pos, **kw):
        from interspeech_ser_tpu.models.text import (
            _gather_last_static,
            _log_bucket_positions,
        )

        rel = _log_bucket_positions(t, buckets, max_pos)
        idx = np.clip(rel + span, 0, 2 * span - 1)
        x = jnp.asarray(RNG.normal(size=(2, 3, t, 2 * span)).astype(np.float32))
        want = jnp.take_along_axis(x, jnp.asarray(idx)[None, None], axis=-1)
        got = _gather_last_static(x, idx, **kw)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_linear_regime_matches_gather(self):
        # T=80 production case: |q-k| < bucket/2, pure Toeplitz window
        self._check(t=80, span=256, buckets=256, max_pos=512)

    def test_log_bucket_regime_matches_gather(self):
        # T > bucket/2 → log-bucketed (non-Toeplitz) indices
        self._check(t=48, span=16, buckets=16, max_pos=128)

    def test_fallback_path_is_gather(self):
        # threshold forces the take_along_axis fallback; still exact
        self._check(t=48, span=16, buckets=16, max_pos=128, max_onehot_elems=1)


class TestToeplitzRelSelect:
    """The Toeplitz select experiment (SER_TPU_DEBERTA_TOEPLITZ=1; measured
    NEGATIVE on v5e — 243.9 vs 395.4 seq/s, the skew's lane-dim reshapes
    force relayouts) must still be EXACT: one-hot over relative offsets +
    pad/reshape skew == the per-(q,k) take_along_axis."""

    def _check(self, t, span, buckets, max_pos):
        from interspeech_ser_tpu.models.text import (
            _log_bucket_1d,
            _log_bucket_positions,
            _toeplitz_rel_select,
        )

        rel_1d = np.arange(-(t - 1), t)
        idx_1d = np.clip(_log_bucket_1d(rel_1d, buckets, max_pos) + span,
                         0, 2 * span - 1)
        lo, hi = int(idx_1d.min()), int(idx_1d.max()) + 1
        idx2d = np.clip(_log_bucket_positions(t, buckets, max_pos) + span,
                        0, 2 * span - 1)
        x = jnp.asarray(RNG.normal(size=(2, 3, t, hi - lo)).astype(np.float32))
        want = jnp.take_along_axis(x, jnp.asarray(idx2d - lo)[None, None], axis=-1)
        got = _toeplitz_rel_select(x, idx_1d - lo, t)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_linear_regime(self):
        self._check(t=80, span=256, buckets=256, max_pos=512)

    def test_log_bucket_regime(self):
        self._check(t=48, span=16, buckets=16, max_pos=128)

    def test_deberta_forward_flag_equality(self, monkeypatch):
        """Full tiny-DeBERTa forward: flag on == flag off bitwise-close."""
        from interspeech_ser_tpu.models.text import DebertaV2Config, DebertaV2Model

        cfg = DebertaV2Config(
            vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=128,
            position_buckets=16, max_relative_positions=-1,
        )
        model = DebertaV2Model(cfg)
        ids = jnp.asarray(RNG.integers(3, 200, size=(2, 24)))
        mask = jnp.ones((2, 24), jnp.float32)
        import jax

        params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
        out_off = model.apply({"params": params}, ids, mask)["last_hidden_state"]
        monkeypatch.setenv("SER_TPU_DEBERTA_TOEPLITZ", "1")
        out_on = model.apply({"params": params}, ids, mask)["last_hidden_state"]
        np.testing.assert_allclose(
            np.asarray(out_on), np.asarray(out_off), atol=1e-5
        )
