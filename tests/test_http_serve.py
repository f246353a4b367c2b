"""HTTP serving front end (cli/serve.py): end-to-end over a real socket."""

import json
import threading
import urllib.request

import numpy as np
import jax
import pytest

from mmda_tpu.config import Config
from mmda_tpu.data.etl.tokenizer import WordPieceTokenizer
from mmda_tpu.models import get_model
from mmda_tpu.cli.serve import serve

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def endpoint():
    cfg = Config(hidden_size=16, visual_size=5, acoustic_size=6, vocab_size=64,
                 embedding_size=8, compute_dtype="float32", use_bert=False,
                 batch_size=8, bucket_sizes=(4, 8), max_seq_len=8, log_sinks=(),
                 port=0)
    init_fn, _ = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world"])}
    tok = WordPieceTokenizer(vocab)
    httpd, psrv = serve(cfg, params=params, port=0, tokenizer=tok,
                        word2id={"hello": 5, "world": 6}, timeout_s=60)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://{httpd.server_address[0]}:{httpd.server_address[1]}"
    yield url
    httpd.shutdown()
    psrv.close()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/predict", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_healthz(endpoint):
    with urllib.request.urlopen(endpoint + "/healthz", timeout=60) as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["ok"]


def test_raw_text_predict(endpoint):
    status, body = _post(endpoint, {"text": "hello world"})
    assert status == 200
    assert len(body["scores"]) == 6
    assert all(np.isfinite(body["scores"]))
    assert set(body) >= {"scores", "labels", "tcp"}


def test_array_predict_and_concurrency(endpoint):
    L = 4
    payload = {
        "text": RNG.integers(2, 64, size=L).tolist(),
        "visual": RNG.normal(size=(L, 5)).tolist(),
        "acoustic": RNG.normal(size=(L, 6)).tolist(),
        "bert_ids": RNG.integers(3, 64, size=L + 2).tolist(),
        "bert_type": [0] * (L + 2),
        "bert_mask": [1] * (L + 2),
    }
    results = {}

    def client(i):
        results[i] = _post(endpoint, payload)

    ts = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(results) == 6
    ref = results[0][1]["scores"]
    for status, body in results.values():
        assert status == 200
        np.testing.assert_allclose(body["scores"], ref, rtol=1e-5)


def test_bad_request_is_400_and_server_survives(endpoint):
    try:
        _post(endpoint, {"visual": "not an array"})
        status = 200
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400
    status, _ = _post(endpoint, {"text": "hello"})
    assert status == 200
