# User dataset plugins live here (the reference's data/ layout, train.py:119):
# a module data/<name>.py exposing training_x, training_y, testing_x,
# testing_y (+ optional training_aux, testing_aux) is loadable with
#   python train.py <name> <params.prms>
# Built-in datasets (mnist, synth, synth3, synth_aux) resolve from
# theanet_tpu.data when no module of that name exists here.
