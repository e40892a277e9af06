from .train import (TrainCfg, make_mesh, make_optimizer, make_train_step,
                    prepare_targets_device, shard_batch)
