from danet_tpu.parallel.sharding import (  # noqa: F401
    active_mesh, batch_sharding, make_mesh, mesh_from_hparams,
    named_shardings, param_pspecs, replicated, set_active_mesh,
    shard_params, stacked_batch_sharding)
