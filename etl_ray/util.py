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


def resolve_fs(path: str):
    """URI → (pyarrow filesystem, fs-local path). Plain paths stay on the
    local filesystem; ``s3://``/``gs://``/``file://`` URIs route through
    pyarrow.fs (the reference streams archives from object storage,
    storage/storage.go:242-304 — here any pyarrow-supported store works;
    ray.data readers accept the same URIs natively)."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def fs_listdir(path: str):
    """Sorted (name, size) of regular files under ``path`` (non-recursive),
    URI-transparent."""
    from pyarrow import fs as pafs

    f, p = resolve_fs(path)
    sel = pafs.FileSelector(p, recursive=False)
    infos = [i for i in f.get_file_info(sel) if i.type == pafs.FileType.File]
    return f, sorted((i.base_name, i.size) for i in infos)


def read_parquet_any(paths, **kwargs):
    """ray.data.read_parquet that accepts a LIST of URIs: Ray resolves a
    filesystem only from the first path and then rejects the remaining
    URIs ('Expected a local filesystem path, got a URI'), so pre-resolve
    the filesystem once and pass fs-local paths."""
    import ray.data as rd

    paths = list(paths)
    if not any("://" in p for p in paths):
        return rd.read_parquet(paths, **kwargs)
    f, first = resolve_fs(paths[0])
    locals_ = [resolve_fs(p)[1] if "://" in p else p for p in paths]
    return rd.read_parquet(locals_, filesystem=f, **kwargs)


def to_pandas_keep_schema(ds):
    """``Dataset.to_pandas()`` that preserves COLUMN NAMES when every block
    is empty. Ray's streaming executor drops empty blocks, so an all-empty
    result loses its schema through ``to_pandas()`` (observed on 2.49:
    zero columns); ``ds.schema()`` still knows it — rebuild the empty
    frame from that."""
    df = ds.to_pandas()
    if len(df) == 0 and len(df.columns) == 0:
        schema = ds.schema()
        if schema is not None:
            import pyarrow as pa

            empty = pa.schema(
                [pa.field(n, t) for n, t in
                 zip(schema.names, schema.types)]).empty_table()
            return empty.to_pandas()
    return df
