"""The real-model code paths (fastText LID, SentencePiece, KenLM) are gated
on libraries absent from this sandbox, so in round 1 every `except Exception`
fallback branch was untested — the plumbing could rot silently. These tests
inject FAKE modules into sys.modules (fixed predictions, call counting) to
prove:

- each loader actually loads + uses the real model when lib + weights exist,
- the per-worker _MODEL_CACHE loads each model exactly once,
- a broken lib/model falls back to the stub instead of failing the job.

The pandas-UDF bodies are invoked directly via `.func` (in-process) — the
gating logic is pure Python, no Spark workers needed.
"""

import sys

import pandas as pd
import pytest

from ccnet_spark_spark import models
from ccnet_spark_spark.operators.perplexity import _real_kenlm, make_perplexity_udf
from ccnet_spark_spark.operators.tokenize import _real_sp, make_tokenize_udf


@pytest.fixture(autouse=True)
def clean_cache_and_modules():
    saved = {k: sys.modules.get(k) for k in ("fasttext", "sentencepiece", "kenlm")}
    models._MODEL_CACHE.clear()
    yield
    models._MODEL_CACHE.clear()
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


# ------------------------------------------------------------------ fastText
class _FakeFastTextModel:
    def predict(self, texts, k=1):
        labels = [("__label__fr" if "bonjour" in t else "__label__en",) for t in texts]
        probs = [(0.97,) if "bonjour" in t else (0.12,) for t in texts]
        return labels, probs


class _FakeFastText:
    def __init__(self):
        self.loads = 0

    def load_model(self, path):
        self.loads += 1
        return _FakeFastTextModel()


def test_real_lid_branch_with_fake_fasttext(tmp_path):
    fake = _FakeFastText()
    sys.modules["fasttext"] = fake
    weights = tmp_path / "lid.bin"
    weights.write_bytes(b"fake")

    out = models.predict_lang(
        pd.Series(["bonjour le monde", "low confidence text"]), model_path=str(weights)
    )
    assert list(out["lang"]) == ["fr", None]  # 0.12 < threshold -> null
    assert out["score"][0] == 0.97
    # cache: second batch must NOT reload the model
    models.predict_lang(pd.Series(["bonjour"]), model_path=str(weights))
    assert fake.loads == 1


def test_lid_falls_back_to_stub_when_lib_broken(tmp_path):
    class _Broken:
        def load_model(self, path):
            raise OSError("corrupt model")

    sys.modules["fasttext"] = _Broken()
    weights = tmp_path / "lid.bin"
    weights.write_bytes(b"x")
    out = models.predict_lang(pd.Series(["the quick brown fox jumps over the lazy dog"]), model_path=str(weights))
    assert out["lang"][0] == "en"  # stub LID result, not an exception


# -------------------------------------------------------------- SentencePiece
class _FakeSPProcessor:
    def __init__(self, registry):
        self._registry = registry

    def load(self, path):
        self._registry["loaded_paths"].append(path)

    def encode_as_pieces(self, text):
        return ["<sp>" + w for w in text.split()]


class _FakeSentencePiece:
    def __init__(self):
        self.registry = {"loaded_paths": []}

    def SentencePieceProcessor(self):
        return _FakeSPProcessor(self.registry)


def test_real_sp_branch_with_fake_lib(tmp_path):
    fake = _FakeSentencePiece()
    sys.modules["sentencepiece"] = fake
    lm_dir = str(tmp_path)

    sp = _real_sp("en", lm_dir)
    assert sp is not None
    assert fake.registry["loaded_paths"] == [f"{lm_dir}/en.sp.model"]
    assert _real_sp("en", lm_dir) is sp  # cached, not reloaded

    tok_fn = make_tokenize_udf(lm_dir).func
    out = tok_fn(pd.Series(["hello world"]), pd.Series(["en"]))
    assert out[0] == "<sp>hello <sp>world"


def test_sp_falls_back_to_stub_per_lang(tmp_path):
    # lib importable but load() raises (missing weights for this lang):
    # known-vocab langs fall back to the stub tokenizer, unknown langs -> null
    class _BrokenSP:
        def SentencePieceProcessor(self):
            raise FileNotFoundError("no weights")

    sys.modules["sentencepiece"] = _BrokenSP()
    tok_fn = make_tokenize_udf(str(tmp_path)).func
    out = tok_fn(pd.Series(["Hello World", "whatever"]), pd.Series(["en", "qq"]))
    assert out[0] == models.stub_tokenize_one("Hello World")
    assert out[1] is None


# --------------------------------------------------------------------- KenLM
class _FakeKenLMModel:
    def __init__(self, registry):
        self._registry = registry

    def score(self, line):
        self._registry["scored"].append(line)
        return -2.0 * max(len(line.split()), 1)


class _FakeKenLM:
    def __init__(self):
        self.registry = {"configs": [], "loads": [], "scored": []}

    def Config(self):
        class _Cfg:
            load_method = None

        cfg = _Cfg()
        self.registry["configs"].append(cfg)
        return cfg

    def Model(self, path, cfg):
        self.registry["loads"].append((path, cfg.load_method))
        return _FakeKenLMModel(self.registry)


def test_real_kenlm_branch_with_fake_lib(tmp_path):
    fake = _FakeKenLM()
    sys.modules["kenlm"] = fake
    lm_dir = str(tmp_path)

    model = _real_kenlm("en", lm_dir)
    assert model is not None
    # the mmap lesson (reference pipe_perplexity.py:8-18): load_method=2
    assert fake.registry["loads"] == [(f"{lm_dir}/en.arpa.bin", 2)]
    assert _real_kenlm("en", lm_dir) is model  # cached

    pp_fn = make_perplexity_udf(lm_dir).func
    out = pp_fn(pd.Series(["two words\none"]), pd.Series(["en"]))
    # line1: score=-4, len=3; line2: score=-2, len=2 -> 10^(6/5) = 15.8
    assert out[0] == pytest.approx(15.8, abs=0.05)
    assert fake.registry["scored"] == ["two words", "one"]


def test_kenlm_falls_back_to_stub_when_weights_missing(tmp_path):
    class _BrokenKenLM:
        def Config(self):
            raise ImportError("no native lib")

    sys.modules["kenlm"] = _BrokenKenLM()
    pp_fn = make_perplexity_udf(str(tmp_path)).func
    tok = models.stub_tokenize_one("some normal words here")
    out = pp_fn(pd.Series([tok]), pd.Series(["en"]))
    assert out[0] == pytest.approx(models.stub_perplexity_one(tok), abs=0.05)


def test_fused_tok_pp_uses_real_models(tmp_path):
    sys.modules["sentencepiece"] = _FakeSentencePiece()
    sys.modules["kenlm"] = _FakeKenLM()
    from ccnet_spark_spark.operators.perplexity import make_tok_pp_udf

    fn = make_tok_pp_udf(str(tmp_path)).func
    out = fn(pd.Series(["hello world"]), pd.Series(["en"]))
    assert out["tokenized"][0] == "<sp>hello <sp>world"
    # fused path must score the SP pieces: score=-4, length=3 -> 10^(4/3)
    assert out["perplexity"][0] == pytest.approx(10 ** (4 / 3), abs=0.05)
