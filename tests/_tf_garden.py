"""Eval-mode-faithful stand-ins for the TF-Model-Garden (`official`)
pieces the reference models import — the package itself isn't in this
image, which is the ONE reason the nn_blocks-based reference models
(vit_backbone, ChunkEncoder, RAGHead, RATTHead) couldn't previously run
as differential oracles.

What is and isn't ours here:

- the attention math is NOT re-implemented — `TransformerEncoderBlock`
  uses the real ``tf_keras.layers.MultiHeadAttention``, the very layer
  Model Garden's block wraps (key_dim = hidden // heads, internal
  1/sqrt(key_dim) scaling, softmax probs as the returned scores);
- the wiring is transcribed from the norm_first=True path of
  ``official/nlp/modeling/layers/transformer_encoder_block.py``:
  ``x + MHA(LN(x))`` then ``x + Dense_out(act(Dense_inner(LN(x))))``
  with output-dropout after each sublayer (a no-op in the eval-mode
  differentials that use this);
- ``activations.gelu`` is Model Garden's tanh-approximate GELU
  (``tf_keras.activations.gelu(x, approximate=True)``);
- every config knob the reference passes but never exercises off its
  defaults (stochastic depth, layer scale, partition dims, regularizers)
  is asserted to its reference value rather than implemented, so a
  drifted differential world fails loudly instead of silently diverging.

Internal attribute names mirror Model Garden's so transplant code reads
the same fields it would on the real block.

KERAS-2/3 TRAP: these stand-ins are tf_keras (keras 2) layers, but the
reference models that hold them subclass ``tensorflow.keras`` (keras 3
in this image). Keras 3 does NOT track keras-2 sublayers, so
``model.trainable_variables`` / ``save_weights`` on such a reference
model SILENTLY OMITS every block weight (in the reference's own
environment everything was one keras and tracking worked). Forward
passes and direct attribute reads are unaffected. Any differential
that trains or enumerates variables must use :func:`tracked_variables`
(or an equivalent shim) instead of ``model.trainable_variables``.

Reference block config being reproduced (identical at all four usage
sites): nba_proj/models/vit_backbone.py:159-175,
nba_proj/models/chunk_encoder.py:17-31, nba_proj/models/rag_head.py:16-31,
nba_proj/models/ratt_head.py:17-32.
"""

import types

import tf_keras

_layers = tf_keras.layers


def garden_gelu(x):
    """official.modeling.activations.gelu — tanh approximation."""
    return tf_keras.activations.gelu(x, approximate=True)


def get_stochastic_depth_rate(init_rate, i, n):
    """official.vision.modeling.layers.nn_layers.get_stochastic_depth_rate."""
    if init_rate is None:
        return None
    if init_rate < 0 or init_rate > 1:
        raise ValueError("init_rate must be in [0, 1]")
    return init_rate * float(i) / n


class TransformerEncoderBlock(_layers.Layer):
    """norm_first pre-norm transformer block, eval-mode faithful to
    official.vision.modeling.layers.nn_blocks.TransformerEncoderBlock."""

    # Positional order matches the real Model Garden block
    # (num_attention_heads, inner_dim, inner_activation first) so a
    # reference call site passing positionally binds identically; all
    # four current sites use keywords.
    def __init__(self, num_attention_heads=None, inner_dim=None,
                 inner_activation=None,
                 output_dropout=0.0, attention_dropout=0.0,
                 kernel_regularizer=None, kernel_initializer="glorot_uniform",
                 norm_first=False, stochastic_depth_drop_rate=0.0,
                 norm_epsilon=1e-12, layer_scale_init_value=0.0,
                 transformer_partition_dims=None,
                 return_attention_scores=False, **kwargs):
        super().__init__(**kwargs)
        if not norm_first:
            raise NotImplementedError(
                "stand-in covers only the reference's norm_first=True")
        if stochastic_depth_drop_rate:
            raise NotImplementedError("reference uses rate 0.0")
        if layer_scale_init_value:
            raise NotImplementedError("reference uses layer scale 0.0")
        if transformer_partition_dims is not None:
            raise NotImplementedError("reference passes None")
        self._inner_activation = inner_activation
        self._num_heads = num_attention_heads
        self._inner_dim = inner_dim
        self._output_dropout_rate = output_dropout
        self._attention_dropout_rate = attention_dropout
        self._kernel_initializer = kernel_initializer
        self._kernel_regularizer = kernel_regularizer
        self._norm_epsilon = norm_epsilon
        self._return_attention_scores = return_attention_scores

    def build(self, input_shape):
        hidden = int(input_shape[-1])
        if hidden % self._num_heads:
            raise ValueError(
                f"hidden {hidden} not divisible by heads {self._num_heads}")
        self._attention_layer = _layers.MultiHeadAttention(
            num_heads=self._num_heads,
            key_dim=hidden // self._num_heads,
            dropout=self._attention_dropout_rate,
            kernel_initializer=self._kernel_initializer,
            kernel_regularizer=self._kernel_regularizer,
            name="self_attention")
        self._attention_dropout = _layers.Dropout(self._output_dropout_rate)
        self._attention_layer_norm = _layers.LayerNormalization(
            epsilon=self._norm_epsilon, name="self_attention_layer_norm")
        self._intermediate_dense = _layers.Dense(
            self._inner_dim, kernel_initializer=self._kernel_initializer,
            kernel_regularizer=self._kernel_regularizer, name="intermediate")
        self._output_dense = _layers.Dense(
            hidden, kernel_initializer=self._kernel_initializer,
            kernel_regularizer=self._kernel_regularizer, name="output")
        self._output_dropout = _layers.Dropout(self._output_dropout_rate)
        self._output_layer_norm = _layers.LayerNormalization(
            epsilon=self._norm_epsilon, name="output_layer_norm")
        super().build(input_shape)

    def call(self, inputs, training=None):
        x = inputs
        y = self._attention_layer_norm(x)
        attn, scores = self._attention_layer(
            query=y, value=y, training=training,
            return_attention_scores=True)
        attn = self._attention_dropout(attn, training=training)
        x = x + attn
        y = self._output_layer_norm(x)
        inner = self._inner_activation(self._intermediate_dense(y))
        out = self._output_dense(inner)
        out = self._output_dropout(out, training=training)
        out = x + out
        if self._return_attention_scores:
            return out, scores
        return out


def tracked_variables(model, blocks_attr="transformer_blocks"):
    """``model.trainable_variables`` + the stand-in blocks' variables the
    keras-3 Model fails to track (see the module-docstring trap). The
    union reproduces the variable set the reference environment's
    single-keras tracking would give."""
    out = list(model.trainable_variables)
    for block in getattr(model, blocks_attr, []):
        out.extend(block.trainable_variables)
    return out


def block_flax_params(block):
    """Map one stand-in block's Keras weights to our EncoderBlock's Flax
    param dict (models/vit.py: ln1/attn{query,key,value,out}/ln2/mlp)."""
    mha = block._attention_layer
    return {
        "ln1": {"scale": block._attention_layer_norm.gamma.numpy(),
                "bias": block._attention_layer_norm.beta.numpy()},
        "ln2": {"scale": block._output_layer_norm.gamma.numpy(),
                "bias": block._output_layer_norm.beta.numpy()},
        "attn": {
            "query": {"kernel": mha._query_dense.kernel.numpy(),
                      "bias": mha._query_dense.bias.numpy()},
            "key": {"kernel": mha._key_dense.kernel.numpy(),
                    "bias": mha._key_dense.bias.numpy()},
            "value": {"kernel": mha._value_dense.kernel.numpy(),
                      "bias": mha._value_dense.bias.numpy()},
            "out": {"kernel": mha._output_dense.kernel.numpy(),
                    "bias": mha._output_dense.bias.numpy()},
        },
        "mlp": {
            "fc1": {"kernel": block._intermediate_dense.kernel.numpy(),
                    "bias": block._intermediate_dense.bias.numpy()},
            "fc2": {"kernel": block._output_dense.kernel.numpy(),
                    "bias": block._output_dense.bias.numpy()},
        },
    }


def garden_modules():
    """{module_name: module} stand-ins for sys.modules, covering every
    ``official`` import in the reference's nn_blocks-based models."""

    def mod(name, **attrs):
        m = types.ModuleType(name)
        m.__path__ = []
        for k, v in attrs.items():
            setattr(m, k, v)
        return m

    nn_blocks = mod("official.vision.modeling.layers.nn_blocks",
                    TransformerEncoderBlock=TransformerEncoderBlock)
    nn_layers = mod("official.vision.modeling.layers.nn_layers",
                    get_stochastic_depth_rate=get_stochastic_depth_rate)
    activations = mod("official.modeling.activations", gelu=garden_gelu)
    # factory / VIT_SPECS are imported by vit_backbone.py but only used
    # in its commented-out registered builder.
    factory = mod("official.vision.modeling.backbones.factory",
                  register_backbone_builder=lambda *_a, **_k: (lambda f: f))
    vit_specs = mod("official.vision.modeling.backbones.vit_specs",
                    VIT_SPECS={})
    return {
        "official": mod("official"),
        "official.modeling": mod("official.modeling",
                                 activations=activations),
        "official.modeling.activations": activations,
        "official.vision": mod("official.vision"),
        "official.vision.modeling": mod("official.vision.modeling"),
        "official.vision.modeling.layers": mod(
            "official.vision.modeling.layers",
            nn_blocks=nn_blocks, nn_layers=nn_layers),
        "official.vision.modeling.layers.nn_blocks": nn_blocks,
        "official.vision.modeling.layers.nn_layers": nn_layers,
        "official.vision.modeling.backbones": mod(
            "official.vision.modeling.backbones",
            factory=factory, vit_specs=vit_specs),
        "official.vision.modeling.backbones.factory": factory,
        "official.vision.modeling.backbones.vit_specs": vit_specs,
    }
