"""HTTP serving entry — `python -m mmda_tpu.cli.serve`.

Net-new surface (the reference's inference.py is a TODO stub and it has no
serving at all): a dependency-free stdlib HTTP front end over
`serving_server.PredictionServer`, so a trained checkpoint can be queried
over the network.

  POST /predict   {"text": "a string"}                          (raw text)
                  or {"text": [ids...], "visual": [[...]...],
                      "acoustic": [[...]...], "bert_ids": [...],
                      "bert_type": [...], "bert_mask": [...]}    (arrays)
                  -> {"scores": [...], "labels": [...], "tcp": [...]}
  GET  /healthz   -> {"ok": true, "stats": {...}}

Requests from concurrent clients are coalesced into micro-batches by the
PredictionServer worker (one compiled program per bucket, warmed at startup).

Usage:
  python -m mmda_tpu.cli.serve --data mosei --ckpt_dir checkpoints \\
      --port 8321 [--vocab_file vocab.txt]
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def _to_request(payload: dict) -> dict:
    """JSON payload -> Predictor request row (numpy arrays or raw text)."""
    if isinstance(payload.get("text"), str):
        req = {"text": payload["text"]}
        for k in ("visual", "acoustic"):
            if k in payload:
                req[k] = np.asarray(payload[k], np.float32)
        return req
    req = {}
    for k, dt in (("text", np.int32), ("bert_ids", np.int32),
                  ("bert_type", np.int32), ("bert_mask", np.int32),
                  ("visual", np.float32), ("acoustic", np.float32)):
        if k in payload:
            req[k] = np.asarray(payload[k], dt)
    return req


def make_handler(server, default_timeout_s: float):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True, "stats": server.stats})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                result = server.predict(_to_request(payload),
                                        timeout_s=default_timeout_s)
                self._reply(200, {
                    "scores": np.asarray(result["scores"]).tolist(),
                    "labels": np.asarray(result["labels"]).tolist(),
                    "tcp": np.asarray(result["tcp"]).tolist(),
                })
            except TimeoutError:
                self._reply(504, {"error": "request timed out"})
            except Exception as e:  # surface as a 4xx, keep serving
                from mmda_tpu.serving import RequestTooLongError

                code = 413 if isinstance(e, RequestTooLongError) else 400
                self._reply(code, {"error": str(e)})

        def log_message(self, fmt, *args):  # quiet access log
            pass

    return Handler


def serve(cfg, params=None, port: int = 8321, host: str = "127.0.0.1",
          tokenizer=None, word2id=None, timeout_s: float = 30.0,
          warmup: bool = True, ready_event: Optional[threading.Event] = None,
          predictor=None):
    """Build Predictor + PredictionServer + HTTP front end and serve forever.
    Returns (httpd, prediction_server) when run in a thread via
    `threading.Thread(target=httpd.serve_forever)` — see tests.

    predictor: pre-built predictor to front instead of constructing one —
    e.g. an ExportedPredictor serving a StableHLO artifact (`--export_dir`;
    raw-text requests too when the artifact was exported with a baked
    tokenizer, see serving_export.export_model)."""
    import jax

    from mmda_tpu.serving import Predictor
    from mmda_tpu.serving_server import PredictionServer

    if predictor is not None:
        pred = predictor
    else:
        mesh = None
        if len(jax.devices()) > 1 or cfg.tp_size > 1:
            from mmda_tpu.parallel import mesh as pmesh

            mesh = pmesh.make_mesh(dp=-1, tp=cfg.tp_size)
        pred = Predictor(cfg, params=params, tokenizer=tokenizer,
                         word2id=word2id, mesh=mesh)
    psrv = PredictionServer(pred, default_timeout_s=timeout_s)
    if warmup:
        psrv.warmup()
    httpd = ThreadingHTTPServer((host, port), make_handler(psrv, timeout_s))
    if ready_event is not None:
        ready_event.set()
    return httpd, psrv


def main(argv=None):
    from mmda_tpu.config import get_config
    from mmda_tpu.data.etl.tokenizer import WordPieceTokenizer

    cfg = get_config(argv=argv)
    if cfg.device != "tpu":
        import jax

        jax.config.update("jax_platforms", cfg.device)
    tokenizer = None
    if cfg.vocab_file:
        tokenizer = WordPieceTokenizer.from_vocab_file(cfg.vocab_file)
    predictor = None
    if cfg.export_dir:
        # serve a StableHLO artifact (cli/export.py) - no model code runs
        from mmda_tpu.serving_export import ExportedPredictor

        predictor = ExportedPredictor(cfg.export_dir)
    httpd, psrv = serve(cfg, port=cfg.port, tokenizer=tokenizer,
                        predictor=predictor)
    print(f"serving {cfg.model} ({cfg.data}) on http://{httpd.server_address[0]}:"
          f"{httpd.server_address[1]}  [POST /predict, GET /healthz]")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        psrv.close()


if __name__ == "__main__":
    main()
