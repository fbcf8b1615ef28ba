from danet_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding, make_mesh, mesh_from_hparams, named_shardings,
    param_pspecs, replicated, shard_params)
