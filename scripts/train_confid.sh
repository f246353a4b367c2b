#!/bin/sh
# Equivalent of the reference train_confid.sh (ConfidNet branch on)
python -m mmda_tpu.cli.train --data mosei --use_confidNet True
