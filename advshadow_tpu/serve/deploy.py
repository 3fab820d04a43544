"""TCP deploy server — JSON-over-socket generation service.

Protocol-compatible re-design of ref: tools/deploy.py:29-181:
- requests are UTF-8 JSON terminated by the ``-iccv-over`` sentinel,
- one thread per connection,
- the response is the generation result JSON; any error returns "500",
- request fields: conditional, sample, image_size, num_images, act,
  weight_path, result_path (+ num_classes, class_name, cfg_scale when
  conditional).

The generation callable is injected so the server is testable without a
trained model; :func:`default_generate_fn` wires the real framework path
(ckpt -> network -> sampler -> per-image uuid save).
"""

from __future__ import annotations

import json
import os
import socket
import threading
import uuid
from typing import Callable, Dict, Optional

from advshadow_tpu.utils.logger import get_logger

__all__ = ["DeployServer", "default_generate_fn", "send_request"]

logger = get_logger("deploy")

SENTINEL = "-iccv-over"


def default_generate_fn(request: Dict) -> Dict:
    """Checkpoint-driven generation (ref: tools/deploy.py:29-85)."""
    import jax
    import numpy as np

    from advshadow_tpu.core import make_diffusion
    from advshadow_tpu.models import make_network
    from advshadow_tpu.ops.image import to_uint8
    from advshadow_tpu.samplers import make_denoise_fn, make_sampler
    from advshadow_tpu.utils.images import save_images

    from advshadow_tpu.train.checkpoint import load_ckpt

    weight_path = request["weight_path"]
    tree = load_ckpt(weight_path)
    meta = tree.get("metadata", {})

    # request fields win; checkpoint metadata fills the architecture so a
    # non-default network (channel list, act) loads correctly
    conditional = request.get("conditional", meta.get("conditional", False))
    sample = request.get("sample", meta.get("sample", "ddpm"))
    image_size = request.get("image_size", meta.get("image_size", 64))
    num_images = max(int(request.get("num_images", 1)), 1)
    act = request.get("act", meta.get("act", "silu"))
    network = request.get("network", meta.get("network", "unet"))
    result_path = request["result_path"]

    import jax.numpy as jnp

    net_kwargs = {}
    if meta.get("channel"):
        net_kwargs["channel"] = tuple(meta["channel"])
    if request.get("dtype") == "bf16":   # TPU-native fast sampling path
        net_kwargs["dtype"] = jnp.bfloat16
    if conditional:
        num_classes = request.get("num_classes", meta.get("num_classes"))
        class_name = int(request["class_name"])
        # distilled ckpts (cli/distill.py) carry guidance in the weights:
        # the conditional forward is already guided, so CFG defaults off
        cfg_default = 0.0 if meta.get("guidance_baked") else 3.0
        cfg_scale = request.get("cfg_scale", cfg_default)
        model = make_network(network, num_classes=num_classes, act=act,
                             **net_kwargs)
        labels = jnp.full((num_images,), class_name, jnp.int32)
    else:
        model = make_network(network, act=act, **net_kwargs)
        labels, cfg_scale = None, None

    params = (tree["ema_model"]
              if request.get("use_ema") and tree.get("ema_model") is not None
              else tree["model"])
    coeffs = make_diffusion(1000, meta.get("noise_schedule",
                                           "framework_linear"))
    cfg_interval = request.get("cfg_interval")
    denoise = make_denoise_fn(
        model.apply, params, labels, cfg_scale,
        cfg_rescale=float(request.get("cfg_rescale", 0.0)),
        cfg_interval=tuple(cfg_interval) if cfg_interval else None)
    sampler = make_sampler(sample)
    kwargs = {}
    sample_steps = request.get("sample_steps") or meta.get("sample_steps")
    if sample_steps and sample in ("ddim", "plms", "dpmpp", "dpmpp_sde"):
        kwargs["sample_steps"] = int(sample_steps)
    sample_method = (request.get("sample_method")
                     or meta.get("sample_method"))
    if sample_method and sample in ("ddim", "dpmpp", "dpmpp_sde"):
        kwargs["method"] = str(sample_method)
    if request.get("dynamic_threshold") and sample in ("dpmpp", "dpmpp_sde"):
        dt = float(request["dynamic_threshold"])
        if not 0.0 < dt <= 1.0:
            raise ValueError("dynamic_threshold must be a percentile in "
                             f"(0, 1], got {dt}")
        kwargs["dynamic_threshold"] = dt
    if sample == "plms" and conditional:
        kwargs["boot_denoise_fn"] = make_denoise_fn(model.apply, params,
                                                    labels, None)
    rng = jax.random.PRNGKey(int(request.get("seed", 0)))
    x = sampler(coeffs, denoise, rng,
                (num_images, image_size, image_size, 3), **kwargs)
    imgs = np.asarray(to_uint8(x))

    re_json = {"image": []}
    os.makedirs(result_path, exist_ok=True)
    for i in range(num_images):
        name = uuid.uuid1()
        # exact reported filename (ref: tools/deploy.py:74-80)
        save_images(imgs[i: i + 1], os.path.join(result_path, f"{name}.jpg"),
                    nrow=1)
        re_json["image"].append({"image_id": str(name),
                                 "image_name": f"{name}.jpg"})
    return re_json


class DeployServer:
    """Threaded socket server with the reference's framing protocol."""

    def __init__(
        self,
        host: str = "localhost",
        port: int = 12345,
        generate_fn: Callable[[Dict], Dict] = default_generate_fn,
        receive_size: int = 1024 * 1024,
        encoding: str = "utf-8",
    ):
        self.host = host
        self.port = port
        self.generate_fn = generate_fn
        self.receive_size = receive_size
        self.encoding = encoding
        self._server: Optional[socket.socket] = None
        self._stopped = threading.Event()

    def start(self, background: bool = False):
        self._server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._server.bind((self.host, self.port))
        self.port = self._server.getsockname()[1]
        self._server.listen(5)
        logger.info(f"[Server]: Server address: {self._server.getsockname()}")
        if background:
            threading.Thread(target=self._serve_loop, daemon=True).start()
        else:
            self._serve_loop()

    def _serve_loop(self):
        while not self._stopped.is_set():
            try:
                client, address = self._server.accept()
            except OSError:
                break
            logger.info(f"[Server]: Connection address: {address}")
            threading.Thread(target=self._handle, args=(client, address),
                             daemon=True).start()

    def _handle(self, client: socket.socket, address):
        try:
            msg = ""
            while True:
                rec = client.recv(self.receive_size)
                if not rec:
                    break
                msg += rec.decode(self.encoding)
                if msg.strip().endswith(SENTINEL):
                    msg = msg.strip()[: -len(SENTINEL)]
                    break
            request = json.loads(msg)
            response = self.generate_fn(request)
            client.send(json.dumps(response).encode(self.encoding))
            logger.info(f"[Client]: [Successfully] {address}")
        except Exception as e:  # noqa: BLE001 — protocol: "500" on any error
            try:
                client.send("500".encode(self.encoding))
            except OSError:
                pass
            logger.error(f"[Client]: [Error] {e}")
        finally:
            client.close()

    def stop(self):
        self._stopped.set()
        if self._server is not None:
            self._server.close()


def send_request(host: str, port: int, request: Dict,
                 timeout: float = 300.0) -> str:
    """Client helper: send a request with the sentinel and return the raw
    response text ("500" on server error)."""
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.sendall((json.dumps(request) + SENTINEL).encode("utf-8"))
        chunks = []
        while True:
            data = s.recv(1024 * 1024)
            if not data:
                break
            chunks.append(data)
    return b"".join(chunks).decode("utf-8")
