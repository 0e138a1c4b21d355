"""Device mesh, sharding rules, and the training step.

The reference has NO distributed backend (SURVEY §2.3, §5: its only
multi-device mechanism is HF Accelerate's ``device_map="auto"`` layer
placement).  tdax's equivalent is the TPU-native stack: a
``jax.sharding.Mesh`` over ICI, NamedSharding rules (data-parallel over
samples, Megatron-style tensor-parallel over heads/FFN), and XLA
collectives inserted by GSPMD — no NCCL/MPI analogue is needed.
"""

from tdax.parallel.mesh import (fsdp_sharding_rules, hybrid_batch_sharding,
                                make_hybrid_mesh, make_mesh,
                                named_shardings, param_sharding_rules,
                                shard_params)
from tdax.parallel.pipeline import (make_pp_mesh, make_train_step_pp,
                                    pipeline_1f1b_grads, pipeline_forward,
                                    shard_params_pp)
from tdax.parallel.train import (default_optimizer, lm_loss, make_train_step,
                                 train_loop, warmup_cosine_lr)

__all__ = ["make_mesh", "make_hybrid_mesh", "hybrid_batch_sharding",
           "param_sharding_rules", "shard_params",
           "fsdp_sharding_rules", "named_shardings",
           "lm_loss", "make_train_step", "train_loop",
           "default_optimizer", "warmup_cosine_lr",
           "make_pp_mesh", "pipeline_forward", "shard_params_pp",
           "make_train_step_pp", "pipeline_1f1b_grads"]
