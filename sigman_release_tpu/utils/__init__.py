from sigman_release_tpu.utils.ply import save_ply, load_ply
