mol new /tmp/pytest-of-root/pytest-192/test_render_vmd_drawframes_emi0/t.pdb waitfor all
mol delrep 0 top
mol representation NewCartoon 0.3 50
mol color Structure
mol addrep top
rotate x by 0
rotate y by 0
rotate z by 0
scale by 1.0
display projection Orthographic
display ambientocclusion on
axes location Off
color Display Background white
mol drawframes 0 0 0:1:999
for {set i 0} {$i < [molinfo top get numframes]} {incr i} {animate goto $i; mol ssrecalc top}
render Tachyon /root/repo/t.dat
exit
