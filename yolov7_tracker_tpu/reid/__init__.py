"""Appearance models: DeepSORT CNN, OSNet, AFLink, DHN — in Flax."""


def resolve_reid(tracker: str, path: str):
    """(tracker name, --reid_model_path) -> (reid arch name, variables).

    Shared by the track / track_demo / serve CLIs: deepsort gets its
    own CNN (ckpt.t7 'net_dict'), everything else OSNet with the arch
    inferred from the checkpoint filename (default osnet_x0_25, the
    checkpoint the reference ships). Torch checkpoints (.pth/.pt/.t7)
    convert in place; anything else loads as msgpack/npz."""
    import os

    if not path:
        return "none", None
    if tracker == "deepsort":
        reid = "deepsort_cnn"
    else:
        from .osnet import OSNET_CONFIGS

        base = os.path.basename(path)
        reid = next((n for n in OSNET_CONFIGS if n in base),
                    "osnet_x0_25")
    if path.endswith((".pth", ".pt", ".t7")):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("net_dict", ckpt.get("state_dict", ckpt))
        if reid == "deepsort_cnn":
            from .deepsort_cnn import convert_deepsort_cnn

            return reid, convert_deepsort_cnn(sd)
        from .osnet import convert_osnet

        return reid, convert_osnet(sd)
    from ..utils import checkpoint

    return reid, checkpoint.load_variables(path)
