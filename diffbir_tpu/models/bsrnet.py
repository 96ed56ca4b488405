"""RRDBNet (BSRNet/ESRGAN-lineage x4 SR cleaner), NHWC flax.

Behavioral parity target: /root/reference/diffbir/model/bsrnet.py:36-104
(23 RRDB blocks of 3 dense 5-conv blocks with 0.2 residual scaling, two
nearest+conv upsamples). Module names equal torch key fragments
(RRDB_trunk.0.RDB1.conv1 ...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dtype, conv, nearest_upsample_2x


class ResidualDenseBlock5C(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cat = jnp.concatenate
        lrelu = lambda v: nn.leaky_relu(v, 0.2)  # noqa: E731
        x1 = lrelu(conv(self.gc, 3, dtype=self.dtype, name="conv1")(x))
        x2 = lrelu(conv(self.gc, 3, dtype=self.dtype, name="conv2")(cat([x, x1], -1)))
        x3 = lrelu(conv(self.gc, 3, dtype=self.dtype, name="conv3")(cat([x, x1, x2], -1)))
        x4 = lrelu(conv(self.gc, 3, dtype=self.dtype, name="conv4")(cat([x, x1, x2, x3], -1)))
        x5 = conv(self.nf, 3, dtype=self.dtype, name="conv5")(cat([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = ResidualDenseBlock5C(self.nf, self.gc, dtype=self.dtype, name="RDB1")(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, dtype=self.dtype, name="RDB2")(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, dtype=self.dtype, name="RDB3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    sf: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        fea = conv(self.nf, 3, dtype=self.dtype, name="conv_first")(x)
        trunk = fea
        for i in range(self.nb):
            trunk = RRDB(self.nf, self.gc, dtype=self.dtype, name=f"RRDB_trunk.{i}")(trunk)
        trunk = conv(self.nf, 3, dtype=self.dtype, name="trunk_conv")(trunk)
        fea = fea + trunk
        fea = nn.leaky_relu(
            conv(self.nf, 3, dtype=self.dtype, name="upconv1")(nearest_upsample_2x(fea)), 0.2
        )
        if self.sf == 4:
            fea = nn.leaky_relu(
                conv(self.nf, 3, dtype=self.dtype, name="upconv2")(nearest_upsample_2x(fea)), 0.2
            )
        fea = nn.leaky_relu(conv(self.nf, 3, dtype=self.dtype, name="HRconv")(fea), 0.2)
        return conv(self.out_nc, 3, dtype=jnp.float32, name="conv_last")(
            fea.astype(jnp.float32)
        )
