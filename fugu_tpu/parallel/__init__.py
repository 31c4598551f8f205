from fugu_tpu.parallel.sharded import ShardedPack, sharded_search

__all__ = ["ShardedPack", "sharded_search"]
