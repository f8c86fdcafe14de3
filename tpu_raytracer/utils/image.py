"""Image IO + overlay utilities (reference: display_image, kernel.cu:30-43).

Images are [H, W, 3] uint8 in the reference's channel order (OpenCV
BGR): ``save_png`` writes them with cv2 so out.png matches the
reference's output exactly; PIL fallback swaps channels.
"""

from __future__ import annotations

import numpy as np


def save_png(img, fp: str) -> None:
    # one encode implementation (encode_png) so the on-disk out.png and
    # the web viewer's frames can never disagree on channel order
    with open(fp, "wb") as f:
        f.write(encode_png(img))


def encode_png(img) -> bytes:
    """[H, W, 3] u8 (reference BGR channel order) -> PNG bytes, in
    memory (the web viewer's frame endpoint)."""
    img = np.asarray(img, np.uint8)
    try:
        import cv2

        ok, buf = cv2.imencode(".png", img)
        if not ok:  # pragma: no cover
            raise RuntimeError("png encode failed")
        return bytes(buf.tobytes())
    except ImportError:  # pragma: no cover
        import io

        from PIL import Image

        bio = io.BytesIO()
        Image.fromarray(img[..., ::-1]).save(bio, format="PNG")
        return bio.getvalue()


def overlay_fps(img, fps: float):
    """Burn an FPS label into the frame (kernel.cu:40-41)."""
    # np.array (not ascontiguousarray): device arrays view as READ-ONLY
    # numpy buffers and cv2.putText writes in place
    img = np.array(img, np.uint8)
    try:
        import cv2

        cv2.putText(
            img, f"FPS: {fps:f}", (10, 30),
            cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 255, 0), 2,
        )
    except ImportError:  # pragma: no cover
        pass
    return img
