"""Small Ray Data helpers."""

from __future__ import annotations


def descriptor_dataset(items):
    """Dataset of tiny work-descriptor rows, one block per item.

    Descriptor rows are a few bytes; the executor's min-bundle size (1 MiB)
    would coalesce them into a single block and serialize the downstream
    stage. The context tweak is confined to dataset creation (the dataset
    snapshots its DataContext) — combine with ``batch_size=1`` on the
    consuming map_batches.
    """
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    prev = ctx.target_min_block_size
    ctx.target_min_block_size = 0
    try:
        return rd.from_items(items, override_num_blocks=len(items))
    finally:
        ctx.target_min_block_size = prev


def pool_args(config, fn_cls, ctor_args, max_concurrency):
    """map_batches arguments for a stateful stage: a real actor pool when
    ``config.use_actor_pool`` (heavy per-worker state), else a constructed
    instance shipped to a task pool (same class, no actor-spawn cost)."""
    if config.use_actor_pool:
        return fn_cls, dict(
            fn_constructor_args=ctor_args,
            concurrency=max_concurrency,
            num_cpus=1,
        )
    return fn_cls(*ctor_args), {}
