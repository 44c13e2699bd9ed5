from sitator_tpu.io.synthetic import SyntheticMD, make_hopping_trajectory

__all__ = ["SyntheticMD", "make_hopping_trajectory"]
