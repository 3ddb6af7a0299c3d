# Minimal scipy shim (dev/golden-generation only): implements the three
# functions the reference uses, from the published formulas:
#  - stats.gaussian_kde (silverman bandwidth), per the scipy documentation
#  - signal.argrelextrema, per the scipy documentation
#  - spatial.distance.cityblock (L1)
# These definitions are the numeric spec for graft's Scala kernels.
