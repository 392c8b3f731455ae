# Shared helpers for the chip-session runners. Source AFTER setting $OUT:
#   OUT="studies/chip_session_${TAG}"; mkdir -p "$OUT"
#   . "$(dirname "$0")/_session_lib.sh"
#
# The axon TPU tunnel serializes clients and can wedge transiently (probe
# before each arm) or MID-run (retry the arm); see CLAUDE.md.

run() { # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name: $* (timeout ${t}s)" | tee -a "$OUT/session.log"
  local start=$SECONDS
  # Per-invocation log files: a retry must never overwrite the failed
  # attempt's traceback (the r3b GP crash lost its only evidence exactly
  # this way — run_retry attempt 2 clobbered attempt 1's log).
  local log="$OUT/$name.log"
  if [ -e "$log" ]; then
    local i=2
    while [ -e "$OUT/$name.attempt$i.log" ]; do i=$((i + 1)); done
    log="$OUT/$name.attempt$i.log"
  fi
  timeout "$t" "$@" >"$log" 2>&1
  local rc=$?
  echo "=== $name: rc=$rc elapsed=$((SECONDS - start))s log=$log" | tee -a "$OUT/session.log"
  tail -5 "$log" | tee -a "$OUT/session.log"
  return $rc
}

wait_tunnel() { # block until the TPU tunnel answers a probe (wedges are transient)
  # The probe COMPILES AND RUNS a tiny jitted program end-to-end:
  # `jax.devices()` alone can succeed while the remote-compile service is
  # wedged (measured r4b: device probes passed, then every arm hung at its
  # first compile for its whole timeout).
  local i
  for i in $(seq 1 45); do  # wedges can last hours (CLAUDE.md); ~50 min of patience
    if timeout 180 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128)))), jax.devices()[0].platform)" 2>/dev/null | grep -q tpu; then
      echo "tunnel OK (compile probe $i)" | tee -a "$OUT/session.log"; return 0
    fi
    echo "tunnel compile-probe $i failed; retrying in 60s" | tee -a "$OUT/session.log"
    sleep 60
  done
  echo "tunnel unreachable after 45 probes" | tee -a "$OUT/session.log"; return 1
}

run_retry() { # run_retry <attempts> <name> <timeout_s> <cmd...> — tunnel can wedge MID-run
  local tries="$1"; shift
  local name="$1" i
  for i in $(seq 1 "$tries"); do
    wait_tunnel || return 1
    if run "$@"; then return 0; fi
    echo "=== $name: attempt $i failed" | tee -a "$OUT/session.log"
  done
  return 1
}
