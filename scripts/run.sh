#!/usr/bin/env bash
# Launcher (reference parity: scripts/run.sh wrapping torch.distributed.launch).
# Under JAX/GSPMD there is one controller process per host; on a multi-host
# TPU slice simply run this same command on every host (or via your pod
# launcher) — jax.distributed.initialize picks up the TPU runtime env.
#   ./scripts/run.sh configs/atomnas_c.yml [overrides...]
set -euo pipefail
CONFIG=${1:?usage: run.sh <config.yml> [key=value...]}
shift || true
exec python -m atomnas_tpu.cli.train --config "$CONFIG" "$@"
