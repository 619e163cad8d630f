import jax.numpy as jnp
import numpy as np
import pytest

from cl4wsis_tpu.ops.resize import resize_bilinear


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("shape,size", [
    ((2, 8, 8, 3), (16, 16)),
    ((1, 7, 5, 2), (13, 11)),
    ((2, 16, 16, 4), (5, 9)),   # downsample
    ((1, 4, 4, 1), (4, 4)),     # identity
])
def test_matches_torch(align, shape, size):
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(*shape).astype(np.float32)
    y = resize_bilinear(jnp.asarray(x), size, align_corners=align)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    yt = torch.nn.functional.interpolate(xt, size=size, mode="bilinear",
                                         align_corners=align)
    yt = yt.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


def test_hwc_input():
    x = jnp.arange(16.0).reshape(4, 4, 1)
    y = resize_bilinear(x, (8, 8), align_corners=True)
    assert y.shape == (8, 8, 1)
    assert float(y[0, 0, 0]) == 0.0 and float(y[-1, -1, 0]) == 15.0
