#!/usr/bin/env bash
# End-to-end search demo on a single TPU chip with no dataset on disk:
# trains the full supernet on learnable synthetic data at 64px while the
# adaptive resource-aware penalty shrinks it toward a 40-MFLOP budget,
# re-slicing (with equivalence checks) along the way.
set -euo pipefail
exec python -m atomnas_tpu.cli.train app:configs/smoke.yml \
  run.log_dir=runs/demo_search run.resume=false \
  data.dataset=synthetic_learnable data.num_classes=100 data.image_size=64 \
  data.batch_size=256 data.eval_batch_size=256 \
  data.train_examples=25600 data.eval_examples=1024 \
  model.input_size=64 model.num_classes=100 model.compute_dtype=bfloat16 \
  optim.epochs=5 optim.base_lr=0.2 optim.base_batch=256 \
  optim.warmup_epochs=0.5 optim.ema_decay=0.99 \
  search.enabled=true search.penalty=0.004 search.prune_threshold=0.05 \
  search.shrink_interval_steps=25 search.reslice_every_events=8 \
  search.penalty_schedule=adaptive search.flops_budget=40.0e+6 \
  run.log_interval_steps=100 run.eval_interval_epochs=2 "$@"
