#!/bin/sh
# Equivalent of the reference train_micro.sh (micro eval-mode preset)
python -m mmda_tpu.cli.train --data mosei --eval_mode micro --learning_rate 1e-5 --dropout 0.7
