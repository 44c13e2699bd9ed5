from sitator_tpu.io.synthetic import (SyntheticMD, make_fcc_hopping_trajectory, make_hopping_trajectory, make_langevin_trajectory)
from sitator_tpu.io.formats import (
    ArrayTrajectory,
    ChunkedFeeder,
    H5Trajectory,
    NpyTrajectory,
    NpzTrajectory,
    XDATCARTrajectory,
    LammpsDumpTrajectory,
    XYZTrajectory,
    convert_to_npy,
    iread_lammps_dump,
    iread_xdatcar,
    iread_xyz,
    read_lammps_dump,
    read_xdatcar,
    open_trajectory,
    read_xyz,
    read_poscar,
    read_cif,
    read_structure,
    write_poscar,
    write_xyz,
    write_xdatcar,
    write_lammps_dump,
)
from sitator_tpu.io.tensorstore_io import (
    TensorstoreTrajectory,
    convert_to_zarr,
)

__all__ = [
    "SyntheticMD", "make_hopping_trajectory", "make_fcc_hopping_trajectory",
    "make_langevin_trajectory",
    "read_xyz", "write_xyz", "iread_xyz", "open_trajectory",
    "read_poscar", "read_cif", "read_structure", "write_poscar",
    "ArrayTrajectory", "NpyTrajectory", "NpzTrajectory", "H5Trajectory",
    "XYZTrajectory", "XDATCARTrajectory", "LammpsDumpTrajectory",
    "read_xdatcar", "read_lammps_dump", "iread_xdatcar",
    "write_xdatcar", "write_lammps_dump",
    "iread_lammps_dump", "convert_to_npy", "ChunkedFeeder",
    "TensorstoreTrajectory", "convert_to_zarr",
]
