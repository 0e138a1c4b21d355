// float32 instantiation of the Rips engine (see tdax_rips.cc).
#define TDAX_VALUE_T float
#define TDAX_ENTRY tdax_rips_dense_f32
#include "tdax_rips.cc"
