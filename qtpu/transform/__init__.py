"""Model transforms: conversion, calibration, BN folding, freeze/export."""
from qtpu.transform.calibrate import calibrate
from qtpu.transform.convert import (convert_model, quantize_variables,
                                    set_mode, strip_quant)
from qtpu.transform.freeze import freeze

__all__ = ["calibrate", "convert_model", "freeze", "quantize_variables",
           "set_mode", "strip_quant"]
