"""Checkpoint / resume of the render state.

The reference has no file checkpointing at all — its only "resume" is the
progressive ``dev_colors``/``dev_counter`` buffers surviving in device
memory between passes (SURVEY.md section 5). Here the whole
:class:`RenderState` pytree (colors, counter, VPLs, window index, PRNG key,
pass count) round-trips through orbax, giving true resume across process
restarts — and, combined with counter-addressed RNG, bit-identical
continuation.
"""

from __future__ import annotations

import os

import jax


def _mgr(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True),
    )


def save(directory: str, state) -> None:
    import orbax.checkpoint as ocp

    with _mgr(directory) as mgr:
        step = int(state.sample)
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore(directory: str, template):
    """Restore the latest checkpoint; None if the directory has none.

    ``template`` is a state pytree with the right structure/shapes
    (e.g. a fresh `init_state`).
    """
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    with _mgr(directory) as mgr:
        step = mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))
