"""SDXL trained aspect-ratio buckets.

The 40 (height, width) pairs SDXL 1.0 was trained on
(/root/reference/src/model/stablediffusion/mod.rs:583-624); inputs are
validated against this table (sample/main.rs:138-144).
"""

RESOLUTIONS = [
    (512, 2048), (512, 1984), (512, 1920), (512, 1856),
    (576, 1792), (576, 1728), (576, 1664),
    (640, 1600), (640, 1536),
    (704, 1472), (704, 1408), (704, 1344),
    (768, 1344), (768, 1280),
    (832, 1216), (832, 1152),
    (896, 1152), (896, 1088),
    (960, 1088), (960, 1024),
    (1024, 1024), (1024, 960),
    (1088, 960), (1088, 896),
    (1152, 896), (1152, 832),
    (1216, 832), (1280, 768),
    (1344, 768), (1408, 704),
    (1472, 704), (1536, 640),
    (1600, 640), (1664, 576),
    (1728, 576), (1792, 576),
    (1856, 512), (1920, 512),
    (1984, 512), (2048, 512),
]


def validate_resolution(height: int, width: int) -> bool:
    return (height, width) in RESOLUTIONS
