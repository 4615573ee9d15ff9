"""Pure-Python SentencePiece unigram tokenizer (utils/spm.py).

Hand-built ModelProto bytes pin the wire format; known-best segmentations
pin the Viterbi; the DebertaV2 wrapper is checked against the HF framing
conventions the reference's DeBERTa leg uses
(reference: preprocessing/preprocess_deroberta.py:106-118). A parity test
vs the real sentencepiece wheel self-activates where that wheel exists
(absent from this image — the point of the pure-Python path).
"""

import numpy as np
import pytest

from interspeech_ser_tpu.utils.spm import (
    BYTE,
    CONTROL,
    DebertaV2SpmTokenizer,
    NORMAL,
    UNKNOWN,
    UnigramEncoder,
    auto_tokenizer,
    load_spm_model,
    serialize_spm_model,
)


def _toy_pieces():
    # specials as CONTROL (deberta layout: PAD/CLS/SEP at 0-2, UNK typed)
    return [
        ("[PAD]", 0.0, CONTROL),
        ("[CLS]", 0.0, CONTROL),
        ("[SEP]", 0.0, CONTROL),
        ("[UNK]", 0.0, UNKNOWN),
        ("▁", -3.0, NORMAL),
        ("▁hello", -1.0, NORMAL),
        ("▁world", -1.5, NORMAL),
        ("▁hell", -2.0, NORMAL),
        ("o", -0.5, NORMAL),
        ("wor", -2.0, NORMAL),
        ("ld", -2.0, NORMAL),
        ("l", -4.0, NORMAL),
        ("d", -4.0, NORMAL),
        ("he", -4.0, NORMAL),
        ("▁fi", -2.0, NORMAL),
        ("n", -4.0, NORMAL),
        ("e", -4.0, NORMAL),
    ]


@pytest.fixture()
def toy_model(tmp_path):
    p = tmp_path / "spm.model"
    p.write_bytes(serialize_spm_model(_toy_pieces()))
    return str(p)


class TestWireFormat:
    def test_roundtrip(self, toy_model):
        m = load_spm_model(toy_model)
        assert [(p, t) for p, _, t in m.pieces] == [
            (p, t) for p, _, t in _toy_pieces()
        ]
        np.testing.assert_allclose(
            [s for _, s, _ in m.pieces], [s for _, s, _ in _toy_pieces()]
        )
        assert m.unk_id == 3  # from the UNKNOWN-typed piece
        assert m.add_dummy_prefix and m.escape_whitespaces

    def test_normalizer_flags_roundtrip(self, tmp_path):
        p = tmp_path / "nn.model"
        p.write_bytes(
            serialize_spm_model(
                _toy_pieces(), add_dummy_prefix=False,
                remove_extra_whitespaces=False, escape_whitespaces=False,
            )
        )
        m = load_spm_model(str(p))
        assert not m.add_dummy_prefix
        assert not m.remove_extra_whitespaces
        assert not m.escape_whitespaces


class TestViterbi:
    def test_best_segmentation(self, toy_model):
        enc = UnigramEncoder(load_spm_model(toy_model))
        toks, ids = enc.encode("hello world")
        # ▁hello (-1) beats ▁hell+o (-2.5); ▁world (-1.5) beats
        # ▁+wor+ld (-7) and char splits
        assert toks == ["▁hello", "▁world"]
        assert ids == [5, 6]

    def test_suboptimal_prefix_needed(self, toy_model):
        enc = UnigramEncoder(load_spm_model(toy_model))
        toks, _ = enc.encode("hellд")  # 'д' unseen → unk char
        # ▁hell(-2) + unk beats ▁he…; verifies backtrack through unks
        assert toks == ["▁hell", "д"]

    def test_unknown_maps_to_unk_id(self, toy_model):
        enc = UnigramEncoder(load_spm_model(toy_model))
        toks, ids = enc.encode("hello ζζ")
        assert toks == ["▁hello", "▁", "ζ", "ζ"]
        assert ids == [5, 4, 3, 3]  # each unknown char → unk_id

    def test_whitespace_conventions(self, toy_model):
        enc = UnigramEncoder(load_spm_model(toy_model))
        # extra/unicode whitespace collapses; dummy prefix prepends ▁
        a = enc.encode("  hello\tworld   ")[0]
        b = enc.encode("hello world")[0]
        assert a == b == ["▁hello", "▁world"]

    def test_nfkc_normalization(self, toy_model):
        enc = UnigramEncoder(load_spm_model(toy_model))
        # ﬁ (U+FB01) NFKC-decomposes to f+i → matches piece ▁fi
        toks, _ = enc.encode("ﬁne")
        assert toks[0] == "▁fi"

    def test_empty_and_whitespace_only(self, toy_model):
        enc = UnigramEncoder(load_spm_model(toy_model))
        assert enc.encode("")[1] == []
        assert enc.encode("   \t ")[1] == []

    def test_dollar_sign_no_sentinel_collision(self, tmp_path):
        """Review-found bug (r05): a string '$' trie-leaf sentinel
        collided with literal '$' characters — encode('costs $5') crashed,
        and building the trie over a vocab with both piece P and P+'$'
        (the real deberta vocab has such pairs) crashed at load. The
        sentinel must be a non-string key."""
        pieces = _toy_pieces() + [
            ("$", -3.0, NORMAL),
            ("o$", -1.2, NORMAL),  # P and P+'$' both present (P='o')
        ]
        p = tmp_path / "d.model"
        p.write_bytes(serialize_spm_model(pieces))
        enc = UnigramEncoder(load_spm_model(str(p)))  # must not raise
        toks, ids = enc.encode("hello$")
        assert toks == ["▁hell", "o$"]  # o$(-1.2) beats o(-0.5)+$(-3.0)
        toks2, _ = enc.encode("costs $5")
        assert "$" in "".join(toks2)
        assert 3 not in [i for t, i in zip(toks2, _) if t == "$"]

    def test_byte_fallback(self, tmp_path):
        pieces = _toy_pieces() + [
            (f"<0x{b:02X}>", -6.0, BYTE) for b in range(256)
        ]
        p = tmp_path / "bf.model"
        p.write_bytes(serialize_spm_model(pieces, byte_fallback=True))
        enc = UnigramEncoder(load_spm_model(str(p)))
        toks, ids = enc.encode("hellζ")
        # ζ = U+03B6 = CE B6 in UTF-8 → two byte pieces, not unk
        assert toks == ["▁hell", "<0xCE>", "<0xB6>"]
        assert 3 not in ids


class TestViterbiBruteForce:
    """Property test: on random tiny vocabs over a 3-letter alphabet, the
    trie Viterbi must find the EXACT max-score segmentation that exhaustive
    enumeration finds (unknown chars allowed at unk_score). This pins the
    dynamic program itself, not just hand-picked cases."""

    def _enumerate_best(self, s, piece_scores, unk_score):
        best = {0: 0.0}
        n = len(s)
        # dp over prefixes with full enumeration of last-piece choices
        for j in range(1, n + 1):
            cands = []
            for i in range(j):
                if best.get(i) is None:
                    continue
                sub = s[i:j]
                if sub in piece_scores:
                    cands.append(best[i] + piece_scores[sub])
                if j - i == 1:  # unknown single char always available
                    cands.append(best[i] + unk_score)
            best[j] = max(cands)
        return best[n]

    def test_matches_exhaustive_on_random_vocabs(self, tmp_path):
        import itertools
        import random

        from interspeech_ser_tpu.utils.spm import SpmModel

        rng = random.Random(7)
        alphabet = "abc"
        all_pieces = [
            "".join(p)
            for L in (1, 2, 3)
            for p in itertools.product(alphabet, repeat=L)
        ]
        for trial in range(30):
            chosen = rng.sample(all_pieces, rng.randint(3, 12))
            pieces = [("[UNK]", 0.0, UNKNOWN)] + [
                (p, round(rng.uniform(-8.0, -0.5), 3), NORMAL) for p in chosen
            ]
            model = SpmModel(pieces, add_dummy_prefix=False,
                             escape_whitespaces=False)
            enc = UnigramEncoder(model)
            piece_scores = {p: s for p, s, t in pieces if t == NORMAL}
            for _ in range(8):
                s = "".join(rng.choice(alphabet + "z")  # z = unknown char
                            for _ in range(rng.randint(1, 9)))
                segs = enc._segment(s)
                got = sum(
                    piece_scores.get(piece, enc.unk_score)
                    if pid != model.unk_id else enc.unk_score
                    for piece, pid in segs
                )
                want = self._enumerate_best(s, piece_scores, enc.unk_score)
                assert abs(got - want) < 1e-9, (
                    f"trial {trial}: viterbi {got} != exhaustive {want} "
                    f"for {s!r} over {piece_scores}"
                )
                assert "".join(p for p, _ in segs) == s  # exact cover


class TestDebertaV2Wrapper:
    def test_hf_call_convention(self, toy_model, tmp_path):
        tok = DebertaV2SpmTokenizer.from_pretrained(str(tmp_path))
        out = tok(["hello world", "", "hello"], padding="max_length",
                  max_length=8, truncation=True, return_tensors="np")
        ids, mask = out["input_ids"], out["attention_mask"]
        assert ids.shape == mask.shape == (3, 8)
        # [CLS] ▁hello ▁world [SEP] [PAD]…
        assert ids[0].tolist() == [1, 5, 6, 2, 0, 0, 0, 0]
        assert mask[0].tolist() == [1, 1, 1, 1, 0, 0, 0, 0]
        # empty text → [CLS][SEP]
        assert ids[1].tolist()[:2] == [1, 2]
        assert mask[1].sum() == 2

    def test_truncation_keeps_sep(self, toy_model, tmp_path):
        tok = DebertaV2SpmTokenizer.from_pretrained(str(tmp_path))
        out = tok(["hello world hello world hello"], max_length=4)
        row = out["input_ids"][0].tolist()
        assert len(row) == 4
        assert row[0] == 1 and row[-1] == 2  # [CLS] … [SEP]

    def test_non_string_becomes_empty(self, toy_model, tmp_path):
        tok = DebertaV2SpmTokenizer.from_pretrained(str(tmp_path))
        out = tok([float("nan")], max_length=4)  # NaN transcript cell
        assert out["attention_mask"][0].sum() == 2

    def test_auto_tokenizer_fallback_on_spm_dir(self, toy_model, tmp_path):
        # dir has spm.model but no HF tokenizer files → transformers
        # raises, the fallback loads (exactly the no-wheel deberta case)
        tok = auto_tokenizer(str(tmp_path))
        assert isinstance(tok, DebertaV2SpmTokenizer)
        out = tok(["hello"], padding="max_length", max_length=5,
                  truncation=True, return_tensors="np")
        assert out["input_ids"][0].tolist() == [1, 5, 2, 0, 0]

    def test_do_lower_case_from_config(self, toy_model, tmp_path):
        import json

        (tmp_path / "tokenizer_config.json").write_text(
            json.dumps({"do_lower_case": True})
        )
        tok = DebertaV2SpmTokenizer.from_pretrained(str(tmp_path))
        out = tok(["HELLO"], max_length=4)
        assert out["input_ids"][0].tolist()[:3] == [1, 5, 2]


class TestRealWheelParity:
    """Self-activating exactness vs the C++ implementation: skipped where
    the sentencepiece wheel is absent (this image), runs wherever it
    exists — the hand-written ModelProto is valid input for the wheel."""

    def test_pieces_and_ids_match_wheel(self, toy_model):
        spm = pytest.importorskip("sentencepiece")
        sp = spm.SentencePieceProcessor(model_file=toy_model)
        enc = UnigramEncoder(load_spm_model(toy_model))
        for text in ["hello world", "hell o", "ﬁne world", "  hello ",
                     "worldly hello", "ζ hello"]:
            assert enc.encode(text)[0] == sp.encode(text, out_type=str), text
            assert enc.encode(text)[1] == sp.encode(text, out_type=int), text

    def test_deberta_tokenizer_parity(self, tmp_path, toy_model):
        pytest.importorskip("sentencepiece")
        tr = pytest.importorskip("transformers")
        hf = tr.DebertaV2Tokenizer(vocab_file=toy_model)
        ours = DebertaV2SpmTokenizer.from_pretrained(str(tmp_path))
        got = ours(["hello world"], padding="max_length", max_length=8,
                   truncation=True, return_tensors="np")
        want = hf(["hello world"], padding="max_length", max_length=8,
                  truncation=True, return_tensors="np")
        np.testing.assert_array_equal(got["input_ids"], want["input_ids"])
        np.testing.assert_array_equal(
            got["attention_mask"], want["attention_mask"]
        )
