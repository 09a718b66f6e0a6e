from gsplat_tpu.data.readers import SceneInfo, read_scene_info
from gsplat_tpu.data.scene import Scene
