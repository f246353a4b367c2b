#!/bin/sh
# Serve the best-on-dev checkpoint over HTTP (net-new surface; the reference
# has no serving).  POST /predict, GET /healthz.
python -m mmda_tpu.cli.serve --data mosei --port 8321 "$@"
