"""The trainable embedding classifier head.

Same architecture as the reference MLPModel
(/root/reference/models/mlp_model.py:4-15): Linear(input_dim -> 2048) ->
ReLU -> Dropout(0.5) -> Linear(2048 -> num_classes) -> log_softmax.
Two matmuls, MXU-bound; dropout handled by linen RNG so the whole train
step jits as one fused program.
"""

import flax.linen as nn


class MLPModel(nn.Module):
    input_dim: int
    num_classes: int
    dropout_prob: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(2048, name="dense_1")(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=self.dropout_prob, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="dense_2")(x)
        return nn.log_softmax(x, axis=-1)
