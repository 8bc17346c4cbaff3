"""Example user dataset plugin (see data/__init__.py for the contract).

Delegates to the built-in synthetic digits; replace the loading logic with
your own arrays. Images may be (N, maps, side, side), (N, side, side), or
flattened perfect-square (N, side*side); labels are int vectors.
"""

from theanet_tpu.data.synth import make_dataset

training_x, training_y, testing_x, testing_y = make_dataset(
    n_train=4000, n_test=800, seed=1
)
