#!/usr/bin/env python
"""End-to-end demo: every public surface of the framework in ~60 lines.

Run: python examples/demo.py [outdir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import low_light_image_enhancement_tpu as llie
from low_light_image_enhancement_tpu.data.synth import synth_pair
from low_light_image_enhancement_tpu.eval.metrics import psnr_u8
from low_light_image_enhancement_tpu.io.codec import encode_image
from low_light_image_enhancement_tpu.serving import EnhanceServer
from low_light_image_enhancement_tpu.video import VideoEnhancer

import jax.numpy as jnp


def main() -> None:
    outdir = Path(sys.argv[1] if len(sys.argv) > 1 else "demo_out")
    outdir.mkdir(exist_ok=True)
    low, high = synth_pair(0, 400, 600)
    encode_image(low, outdir / "input_low.png")

    # 1. one-liner API
    out = llie.enhance(low)
    encode_image(out, outdir / "enhanced_retinex.png")
    print("retinex:", f"{float(psnr_u8(jnp.asarray(out), jnp.asarray(high))):.2f} dB")

    # 2. every method, through a configured pipeline
    for method in ("curve", "hybrid", "fcn", "decom"):
        pipe = llie.EnhancePipeline(llie.PipelineConfig(method=method))
        out = pipe.enhance(low)
        encode_image(out, outdir / f"enhanced_{method}.png")
        print(f"{method}:", f"{float(psnr_u8(jnp.asarray(out), jnp.asarray(high))):.2f} dB")

    # 3. micro-batching server (single-image latency, batched chip)
    with EnhanceServer(max_delay_ms=5.0) as srv:
        futs = [srv.submit(synth_pair(i, 200, 304)[0]) for i in range(8)]
        outs = [f.result() for f in futs]
    print("server: enhanced", len(outs), "images via micro-batches")

    # 4. flicker-free video
    ve = VideoEnhancer(llie.PipelineConfig(), alpha=0.25)
    rng = np.random.default_rng(0)
    scene = high.astype(np.float32) / 255.0
    means = []
    for _ in range(6):
        level = 0.15 + 0.1 * rng.random()
        frame = (np.clip(scene * level, 0, 1) * 255).astype(np.uint8)
        means.append(ve.process(frame).mean())
    print("video: output means", [round(m, 1) for m in means], "(stable)")

    # 4b. multi-stream video: one frame from each of 3 streams per device
    # step, EMA carry per stream (scene cut in stream 1 via reset(1))
    from low_light_image_enhancement_tpu.video import MultiStreamVideoEnhancer

    mv = MultiStreamVideoEnhancer(3, llie.PipelineConfig(), alpha=0.25)
    frames = np.stack([
        (np.clip(scene * lvl, 0, 1) * 255).astype(np.uint8)
        for lvl in (0.15, 0.2, 0.25)
    ])
    mv.process(frames)
    mv.reset(1)
    outs3 = mv.process(frames)
    print("multi-stream video:", outs3.shape, "carry", mv.carry_bytes, "B")

    # 4c. spatially-sharded video: ONE stream's rows over the mesh's
    # spatial axis (per-shard EMA; here a 1-device mesh — shards scale
    # with jax.devices() on a slice)
    from low_light_image_enhancement_tpu.parallel import (
        SpatialShardedVideoEnhancer,
        make_mesh,
    )

    sve = SpatialShardedVideoEnhancer(make_mesh(n_data=1, n_spatial=1),
                                      llie.PipelineConfig(), alpha=0.25)
    print("sharded video:", sve.process(frames[0]).shape)

    # 5. HTTP serving: POST image bytes, get enhanced bytes back
    import http.client

    from low_light_image_enhancement_tpu.http_server import HttpEnhanceServer
    from low_light_image_enhancement_tpu.io.codec import (
        decode_image,
        encode_image as enc,
    )

    hsrv = HttpEnhanceServer(port=0, max_delay_ms=2.0).start()
    body = enc(low, format="PNG")
    conn = http.client.HTTPConnection("127.0.0.1", hsrv.port, timeout=120)
    conn.request("POST", "/enhance", body=body,
                 headers={"Content-Length": str(len(body))})
    resp = conn.getresponse()
    print("http:", resp.status, decode_image(resp.read()).shape)
    conn.close()
    hsrv.close()

    print("wrote results to", outdir)


if __name__ == "__main__":
    main()
