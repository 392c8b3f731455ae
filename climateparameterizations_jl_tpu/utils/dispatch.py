"""Device-program dispatch planning for long scanned runs.

Remote-TPU tunnels kill any single device program that runs longer than
~60-90 s, so multi-year/multi-day integrations must be dispatched from the
host in bounded chunks (state stays on device between dispatches). The
arithmetic lives HERE, once: the 3-D LES, the double gyre, and the sharded
gyre runner all consume the same plan (they previously each re-implemented
it and had already drifted on budgets and remainder handling).
"""

from __future__ import annotations


def dispatch_plan(
    n_save: int,
    save_every: int,
    n_cells: int,
    max_frames_per_dispatch: int = 256,
    max_steps_per_dispatch: int | None = None,
    cell_step_budget: float = 1.5e10,
):
    """Plan host-chunked dispatch of ``n_save`` frames of ``save_every`` steps.

    The per-dispatch cap is ``max_steps_per_dispatch`` steps, derived when
    ``None`` from ``cell_step_budget`` cell-steps (~40 s of device time at
    the measured ~2-3 ns/cell-step of these solvers) so bigger grids
    automatically dispatch shorter programs.

    Returns either ``("subframe", sub_lengths)`` — one save interval alone
    exceeds the cap and must be split into the given sub-scan lengths
    (``sum(sub_lengths) == save_every``) — or ``("frames", chunk)`` — run
    ``chunk`` whole frames per dispatch.
    """
    if max_steps_per_dispatch is None:
        max_steps_per_dispatch = int(cell_step_budget) // max(int(n_cells), 1)
    steps_cap = max(1, int(max_steps_per_dispatch))
    if save_every > steps_cap:
        n_sub = -(-save_every // steps_cap)
        base, rem = divmod(save_every, n_sub)
        return "subframe", [base + (1 if k < rem else 0) for k in range(n_sub)]
    chunk = max(1, min(int(max_frames_per_dispatch), int(n_save), max(1, steps_cap // max(int(save_every), 1))))
    return "frames", chunk
