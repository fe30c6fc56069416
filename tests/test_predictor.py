"""Predictor API + refcocog annotation naming."""

import numpy as np
import pytest

import jax

from retr_tpu.config import Config
from retr_tpu.data.tokenizer import prepare_tokenizer
from retr_tpu.models import caption
from retr_tpu.predictor import Predictor, ServingQueue


def tiny_predictor(**cfg_kw):
    tok, _, _ = prepare_tokenizer()
    cfg = Config(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, dim_feedforward=128, vocab_size=tok.vocab_size,
        max_position_embeddings=12, dropout=0.0, image_size=64, **cfg_kw,
    )
    params, _ = caption.build_model(cfg, jax.random.key(0))
    return Predictor(params, cfg, tok, max_batch=2)


def test_predict_single_and_batch(rng):
    pred = tiny_predictor()
    img = rng.integers(0, 256, (100, 120, 3), dtype=np.uint8)
    s = pred.predict(img, [10, 10, 50, 40])
    assert isinstance(s, str)
    outs = pred.predict_batch([img, img, img], [[10, 10, 50, 40]] * 3)
    assert len(outs) == 3
    assert outs[0] == outs[1] == outs[2]


def test_predict_beam(rng):
    pred = tiny_predictor(beam_size=2)
    img = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
    s = pred.predict(img, [5, 5, 40, 40], beam=True)
    assert isinstance(s, str)


def test_predict_sample_decoder(rng):
    """decoder='sample' at temperature=0 equals greedy; stochastic draws are
    reproducible per seed; unknown decoders rejected."""
    import pytest

    pred = tiny_predictor(sample_temperature=0.0)
    img = rng.integers(0, 256, (100, 120, 3), dtype=np.uint8)
    bb = [10, 10, 50, 40]
    assert pred.predict(img, bb, decoder="sample") == pred.predict(img, bb)

    pred2 = tiny_predictor(sample_temperature=1.0, sample_top_k=8)
    a = pred2.predict(img, bb, decoder="sample", seed=7)
    b = pred2.predict(img, bb, decoder="sample", seed=7)
    assert isinstance(a, str) and a == b

    with pytest.raises(ValueError, match="unknown decoder"):
        pred2.predict(img, bb, decoder="nope")


def test_predict_loc_variant(rng):
    pred = tiny_predictor(use_location_features=True)
    img = rng.integers(0, 256, (90, 70, 3), dtype=np.uint8)
    s = pred.predict(img, [5, 5, 30, 30])
    assert isinstance(s, str)


def test_serving_queue_batches_and_matches_sync(rng):
    """Async micro-batcher returns the same strings as the synchronous API, across
    more requests than one batch holds (so coalescing + re-dispatch both run)."""
    pred = tiny_predictor()
    imgs = [rng.integers(0, 256, (60 + 10 * i, 80, 3), dtype=np.uint8) for i in range(5)]
    boxes = [[5, 5, 30 + i, 25] for i in range(5)]
    want = pred.predict_batch(imgs, boxes)

    q = ServingQueue(pred, max_wait_s=0.05)
    futs = [q.submit(im, bb) for im, bb in zip(imgs, boxes)]
    got = [f.result(timeout=120) for f in futs]
    q.close()
    assert got == want


def test_serving_queue_propagates_errors(rng):
    pred = tiny_predictor()
    q = ServingQueue(pred, max_wait_s=0.01)
    fut = q.submit(rng.integers(0, 256, (50, 50, 3), dtype=np.uint8), "not-a-bbox")
    try:
        fut.result(timeout=120)
        raised = False
    except Exception:
        raised = True
    q.close()
    assert raised


def test_serving_queue_isolates_bad_request(rng):
    """One malformed request co-batched with good ones fails ONLY its own future;
    the innocent co-batched requests still resolve with the correct expressions."""
    pred = tiny_predictor()
    img = rng.integers(0, 256, (60, 60, 3), dtype=np.uint8)
    bb = [5, 5, 30, 30]
    want = pred.predict(img, bb)

    q = ServingQueue(pred, max_wait_s=0.3)  # long window -> the three coalesce
    bad = q.submit(img, "not-a-bbox")
    good = [q.submit(img, bb) for _ in range(2)]
    results = [f.result(timeout=120) for f in good]
    try:
        bad.result(timeout=120)
        bad_raised = False
    except Exception:
        bad_raised = True
    q.close()
    assert bad_raised
    assert results == [want, want]


def test_serving_queue_rejects_after_close(rng):
    pred = tiny_predictor()
    q = ServingQueue(pred)
    q.close()
    import pytest

    with pytest.raises(RuntimeError):
        q.submit(rng.integers(0, 256, (50, 50, 3), dtype=np.uint8), [1, 1, 10, 10])


def test_serving_queue_sheds_when_full(rng):
    """Admission control: with the dispatcher blocked and ``max_queued`` requests
    standing, the next submit raises ServingOverloaded immediately (with a
    positive Retry-After estimate) instead of growing the backlog; everything
    admitted still resolves once the dispatcher unblocks."""
    import threading

    from retr_tpu.predictor import ServingOverloaded

    pred = tiny_predictor()
    img = rng.integers(0, 256, (60, 60, 3), dtype=np.uint8)
    bb = [5, 5, 30, 30]

    release, entered = threading.Event(), threading.Event()
    orig = pred._preprocess_one

    def slow(image, bbox):
        entered.set()
        release.wait(60)
        return orig(image, bbox)

    pred._preprocess_one = slow
    q = ServingQueue(pred, max_wait_s=0.01, max_queued=2)
    first = q.submit(img, bb)
    assert entered.wait(30)  # dispatcher holds request 1; queue is empty again
    queued = [q.submit(img, bb) for _ in range(2)]  # fills the admission bound
    with pytest.raises(ServingOverloaded) as ei:
        q.submit(img, bb)
    assert ei.value.retry_after_s > 0
    st = q.stats()
    assert st["rejected"] == 1 and st["accepted"] == 3 and st["max_queued"] == 2
    release.set()
    results = [f.result(timeout=120) for f in [first] + queued]
    q.close()
    assert all(isinstance(r, str) for r in results)
    # capacity freed -> a fresh queue admits again (shed is not sticky)
    assert q.stats()["queued"] == 0


def test_http_serving_503_on_overload(rng):
    """The HTTP front end maps ServingOverloaded to 503 with a Retry-After
    header and a retry_after_s body field; the server survives the shed."""
    import base64
    import io
    import json
    import urllib.error
    import urllib.request

    from PIL import Image

    from retr_tpu.serve import run_in_thread

    pred = tiny_predictor()
    img = rng.integers(0, 256, (70, 80, 3), dtype=np.uint8)
    bbox = [5, 5, 40, 30]

    # max_queued=0 sheds every submit deterministically
    q = ServingQueue(pred, max_wait_s=0.02, max_queued=0)
    server, base = run_in_thread(q)
    try:
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        payload = json.dumps({
            "image": base64.b64encode(buf.getvalue()).decode(), "bbox": bbox,
        }).encode()
        req = urllib.request.Request(base + "/predict", data=payload,
                                     headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=30)
            code, retry, body = 200, None, {}
        except urllib.error.HTTPError as e:
            code, retry, body = e.code, e.headers.get("Retry-After"), json.loads(e.read())
        assert code == 503
        assert retry is not None and int(retry) >= 1
        assert body["error"] == "overloaded" and body["retry_after_s"] > 0
        # server alive; healthz carries the admission stats
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] is True and health["queue"]["rejected"] >= 1
    finally:
        server.shutdown()
        q.close()


def test_refcocog_refs_filename(tmp_path):
    """refcocog directories read refs(umd).p (data_utils/utils.py:81 semantics)."""
    import json
    import pickle

    from retr_tpu.data import annotations as ann_mod

    d = tmp_path / "refcocog"
    d.mkdir()
    with open(d / "instances.json", "w") as f:
        json.dump({"annotations": [{"id": 0, "image_id": 7, "bbox": [1, 2, 3, 4],
                                    "category_id": 1}]}, f)
    refs = [{"ann_id": 0, "ref_id": 0, "image_id": 7, "split": "train",
             "file_name": "COCO_train2014_000000000007_0.jpg",
             "sentences": [{"sent_id": 0, "sent": "a thing"}]}]
    with open(d / "refs(umd).p", "wb") as f:
        pickle.dump(refs, f)
    rows, ids = ann_mod.get_refcoco_data(str(d))
    assert rows[0]["caption"] == "a thing"
    assert ids["caption_ids"]["train"] == [0]


@pytest.mark.slow
def test_predict_with_attention(rng):
    pred = tiny_predictor()
    img = rng.integers(0, 256, (90, 100, 3), dtype=np.uint8)
    text, atts = pred.predict_with_attention(img, [8, 8, 50, 40])
    assert isinstance(text, str)
    assert set(atts) == {"enc_tc_self_att", "dec_exp_self_att", "dec_exp_tc_cross_att"}
    cfg = pred.cfg
    T, S = cfg.max_position_embeddings, (cfg.image_size // 32) ** 2
    assert atts["enc_tc_self_att"].shape == (cfg.enc_layers, S, S)
    assert atts["dec_exp_self_att"].shape == (cfg.dec_layers, T, T)
    assert atts["dec_exp_tc_cross_att"].shape == (cfg.dec_layers, T, S)
    # rows are softmax distributions over unmasked positions
    np.testing.assert_allclose(atts["dec_exp_tc_cross_att"].sum(-1), 1.0, atol=1e-4)


def test_http_serving_endpoint(rng):
    """POST /predict through the stdlib HTTP front end returns the same expression
    as the synchronous API; bad requests get 400 without killing the server;
    /healthz responds."""
    import base64
    import io
    import json
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from retr_tpu.predictor import ServingQueue
    from retr_tpu.serve import run_in_thread

    pred = tiny_predictor()
    img = rng.integers(0, 256, (70, 80, 3), dtype=np.uint8)
    bbox = [5, 5, 40, 30]
    want = pred.predict(img, bbox)

    q = ServingQueue(pred, max_wait_s=0.02)
    server, base = run_in_thread(q)
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        payload = json.dumps({
            "image": base64.b64encode(buf.getvalue()).decode(), "bbox": bbox,
        }).encode()

        def post(_):
            req = urllib.request.Request(base + "/predict", data=payload,
                                         headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())["expression"]

        with ThreadPoolExecutor(3) as pool:  # concurrent -> exercises batching
            got = list(pool.map(post, range(3)))
        assert got == [want] * 3

        bad = urllib.request.Request(base + "/predict", data=b'{"bbox": [1,2,3,4]}',
                                     headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 400
        assert raised
        # server still alive after the 400
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True
    finally:
        server.shutdown()
        q.close()


def test_http_image_path_allowlist(rng, tmp_path):
    """'image_path' requests are rejected unless the server was started with an
    allowlist root; with one, only paths inside the root resolve, escapes get a
    generic 400 body that does not echo the probed path."""
    import json
    import urllib.error
    import urllib.request

    from PIL import Image

    from retr_tpu.serve import run_in_thread

    pred = tiny_predictor()
    img = rng.integers(0, 256, (70, 80, 3), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / "ok.png")
    bbox = [5, 5, 40, 30]
    want = pred.predict(img, bbox)

    def post(base, body):
        req = urllib.request.Request(base + "/predict", data=json.dumps(body).encode(),
                                     headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return 200, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    # default: image_path disabled entirely
    q1 = ServingQueue(pred, max_wait_s=0.02)
    server1, base1 = run_in_thread(q1)
    try:
        code, body = post(base1, {"image_path": str(tmp_path / "ok.png"), "bbox": bbox})
        assert code == 400
        assert str(tmp_path) not in json.dumps(body)  # generic body, no path echo
    finally:
        server1.shutdown()
        q1.close()

    # with an allowlist root: inside resolves, escapes are rejected
    q2 = ServingQueue(pred, max_wait_s=0.02)
    server2, base2 = run_in_thread(q2, image_root=str(tmp_path))
    try:
        code, body = post(base2, {"image_path": "ok.png", "bbox": bbox})
        assert code == 200 and body["expression"] == want
        code, body = post(base2, {"image_path": "../../etc/passwd", "bbox": bbox})
        assert code == 400
        assert "passwd" not in json.dumps(body)
    finally:
        server2.shutdown()
        q2.close()


def test_predictor_score(rng):
    """Predictor.score: the model's own greedy output scores a better (lower)
    perplexity than a shuffled word salad for the same region."""
    pred = tiny_predictor()
    img = rng.integers(0, 256, (90, 100, 3), dtype=np.uint8)
    bb = [8, 8, 50, 40]
    own = pred.predict(img, bb)
    if not own.strip():
        own = "red dog"
    res = pred.score([img, img], [bb, bb], [own, "chair red the on dog a running"])
    assert len(res) == 2
    for r in res:
        assert r["n_tokens"] > 0 and r["logprob"] <= 0 and r["ppl"] >= 1.0
    assert res[0]["ppl"] <= res[1]["ppl"] * 5  # sanity scale; own text shouldn't explode


def test_predictor_complete(rng):
    """Predictor.complete returns an expression that starts with the forced
    prefix text (tokenizer round trip included)."""
    pred = tiny_predictor()
    img = rng.integers(0, 256, (90, 100, 3), dtype=np.uint8)
    out = pred.complete(img, [8, 8, 50, 40], "red dog")
    assert isinstance(out, str) and out.startswith("red dog"), out


def test_serving_queue_concurrent_submit_and_close(rng):
    """Many threads submitting while the queue closes: every future resolves —
    either with a result or the closed-queue rejection; no deadlock."""
    import threading
    import time as _time

    pred = tiny_predictor()
    q = ServingQueue(pred, max_wait_s=0.01)
    img = rng.integers(0, 256, (60, 60, 3), dtype=np.uint8)
    futs, errs = [], []
    lock = threading.Lock()

    def submitter():
        for _ in range(4):
            try:
                f = q.submit(img, [5, 5, 30, 30])
                with lock:
                    futs.append(f)
            except RuntimeError:
                with lock:
                    errs.append(1)
            _time.sleep(0.002)

    threads = [threading.Thread(target=submitter) for _ in range(4)]
    for t in threads:
        t.start()
    _time.sleep(0.05)
    q.close(wait=False)
    for t in threads:
        t.join()
    q._dispatcher.join(timeout=300)
    q._collector.join(timeout=300)
    resolved = sum(1 for f in futs if f.done() and (f.exception() is None))
    assert resolved + len(errs) >= 1  # progress happened
    # every accepted-and-dispatched future is terminal (result or exception)
    for f in futs:
        if f.done():
            f.exception()  # must not raise beyond stored exception access
