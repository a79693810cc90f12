/* -*- c++ -*- ----------------------------------------------------------
   fix imagecharges: mirror charged atoms across an electrode plane as
   oppositely-charged image particles, updated every timestep.

   Usage:
     fix ID group-ID imagecharges px py pz nx ny nz itype \
         [region region-ID] [scale s]

   (px, py, pz) is a point on the mirror plane, (nx, ny, nz) its
   normal, `itype` the atom type given to image particles, `region`
   optionally restricts which atoms are imaged, and `scale` scales the
   image charge magnitude (q_image = -scale * q).

   Public API parity:
   /root/reference/lib/lammps-fix-imagecharges/fix_imagecharges.h.
------------------------------------------------------------------------- */

#ifdef FIX_CLASS
// clang-format off
FixStyle(imagecharges, FixImageCharges);
// clang-format on
#else

#ifndef LMP_FIX_IMAGECHARGES_H
#define LMP_FIX_IMAGECHARGES_H

#include "fix.h"

namespace LAMMPS_NS {

class FixImageCharges : public Fix {
 public:
    FixImageCharges(class LAMMPS *, int, char **);
    ~FixImageCharges() override;

    int setmask() override;
    void init() override;
    void setup_pre_force(int) override;
    void min_setup_pre_force(int) override;
    void pre_force(int) override;
    void min_pre_force(int) override;
    void post_force(int) override;
    void min_post_force(int) override;

    double memory_usage() override;
    void grow_arrays(int) override;
    void copy_arrays(int, int, int) override;
    void set_arrays(int) override;
    int pack_exchange(int, double *) override;
    int unpack_exchange(int, double *) override;

 protected:
    double pxvalue, pyvalue, pzvalue;  // point on the mirror plane
    double nxvalue, nyvalue, nzvalue;  // plane normal
    int itype;                         // image particle type
    double scale;                      // image charge scale factor

    char *idregion;
    class Region *region;

    int *imagei;   // per-atom index of the image partner (-1: is one)
    double *imageid;
    int exclusionAtom;

    int varflag;
    int nmax;
    int seenCount, addedCount;
};

}  // namespace LAMMPS_NS

#endif
#endif
