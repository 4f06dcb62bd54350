from .readers import load_table, load_world, read_binary_dir, read_jsonl  # noqa: F401
