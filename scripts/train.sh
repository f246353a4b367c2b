#!/bin/sh
# Equivalent of the reference train.sh
python -m mmda_tpu.cli.train --data mosei
